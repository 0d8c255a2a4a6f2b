"""Live-input interactive flight: browser sliders feed RPMs into a
RUNNING sim.

The reference exposes GUI debug sliders whose values are read into the
motor RPMs every step while the sim runs (BaseAviary.py:162-167 creates
one slider per motor; `_preprocessAction` reads them live,
BaseAviary.py:1053-1062, under `user_debug_gui`). This container is
headless — no PyBullet GUI — so the live-INPUT modality ships as its
headless-native equivalent: a stdlib HTTP server wrapping `CtrlAviary`
(direct-RPM playground, reference envs/CtrlAviary.py) that serves one
HTML page with four RPM sliders and a live chase-camera view ray-cast
in-graph (ops/render). Drag a slider and the running sim responds, same
contract as the reference's rig. The companion live-VIEW modality is
scripts/replay_viewer.py.

    python scripts/live_fly.py [--port 8008] [--platform cpu]

then open http://localhost:8008. The page polls ~20 Hz; each poll steps
the sim by the wall-clock time elapsed since the last poll (capped), so
sim time tracks real time like the reference's `sync()` pacing
(reference utils.py:47-66).
"""

import argparse
import base64
import io
import json
import sys
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

PAGE = """<!DOCTYPE html>
<html><head><title>live fly</title><style>
body{font-family:monospace;background:#111;color:#eee;margin:2em}
input[type=range]{width:320px}
#view{image-rendering:pixelated;width:512px;height:384px;border:1px solid #444}
.row{margin:.4em 0} td{padding:0 .8em 0 0}
</style></head><body>
<h3>gym-pybullet-adrp-tpu &mdash; live RPM sliders (reference
BaseAviary user_debug_gui)</h3>
<div class=row><img id=view width=512 height=384></div>
<div id=sliders></div>
<div class=row>
<button onclick="hover()">all &rarr; hover RPM</button>
<button onclick="zero()">all &rarr; 0</button>
<button onclick="fetch('/reset',{method:'POST'})">reset</button>
</div>
<table id=stats></table>
<script>
const S=[];
function mk(i){
  const d=document.createElement('div'); d.className='row';
  d.innerHTML=`m${i} <input type=range id=s${i} min=0 max=MAXRPM step=1
    value=HOVERRPM oninput="push()"> <span id=v${i}></span>`;
  document.getElementById('sliders').appendChild(d); S.push(i);
}
for(let i=0;i<4;i++) mk(i);
function vals(){return S.map(i=>+document.getElementById('s'+i).value)}
function push(){
  S.forEach(i=>document.getElementById('v'+i).textContent=
    document.getElementById('s'+i).value);
  fetch('/rpm',{method:'POST',body:JSON.stringify(vals())});
}
function setall(v){S.forEach(i=>{document.getElementById('s'+i).value=v});push()}
function hover(){setall(HOVERRPM)} function zero(){setall(0)}
async function tick(){
  try{
    const r=await fetch('/state'); const st=await r.json();
    document.getElementById('view').src='data:image/png;base64,'+st.png;
    document.getElementById('stats').innerHTML=
      `<tr><td>t</td><td>${st.t.toFixed(2)} s</td></tr>`+
      `<tr><td>pos</td><td>${st.pos.map(x=>x.toFixed(2))}</td></tr>`+
      `<tr><td>rpy</td><td>${st.rpy.map(x=>x.toFixed(2))}</td></tr>`+
      `<tr><td>vel</td><td>${st.vel.map(x=>x.toFixed(2))}</td></tr>`+
      `<tr><td>rpm</td><td>${st.rpm.map(x=>x.toFixed(0))}</td></tr>`;
  }catch(e){}
  setTimeout(tick,50);
}
push(); tick();
</script></body></html>"""


class LiveSim:
    """CtrlAviary stepped by wall-clock elapsed time; slider RPMs applied
    every control step (the reference's user_debug_gui contract)."""

    def __init__(self):
        import jax  # noqa: F401  (platform set by caller before import)
        from gym_pybullet_adrp_tpu.envs.aviary import CtrlAviary

        self.env = CtrlAviary(num_drones=1)
        self.env.reset(seed=0)
        self.rpm = np.full((1, 4), self.env.HOVER_RPM, dtype=np.float32)
        self.t = 0.0
        self.last_poll = None
        self.lock = threading.Lock()
        self._render = self._make_render()

    def _make_render(self):
        import jax
        import jax.numpy as jnp

        from gym_pybullet_adrp_tpu.ops import render as rm

        @jax.jit
        def frame(pos):
            scene = rm.Scene(
                cap_center=jnp.zeros((1, 3)), cap_half=jnp.ones((1,)),
                cap_radius=jnp.full((1,), 0.001),
                cap_valid=jnp.zeros((1,), dtype=bool),
                cap_color=jnp.ones((1, 3)) * 0.5,
                sph_center=pos[None], sph_radius=jnp.full((1,), 0.08),
                sph_valid=jnp.ones((1,), dtype=bool),
                sph_color=jnp.asarray([[0.9, 0.2, 0.1]]),
                seg_a=jnp.zeros((1, 3)), seg_b=jnp.ones((1, 3)),
                seg_radius=jnp.full((1,), 0.001),
                seg_valid=jnp.zeros((1,), dtype=bool),
                seg_color=jnp.ones((1, 3)) * 0.5,
            )
            eye = pos + jnp.asarray([-1.2, -1.2, 0.7])
            rgba, _, _ = rm.render(scene, eye, pos, width=128, height=96)
            return rgba[..., :3].astype(jnp.uint8)

        return frame

    def step_to_now(self):
        now = time.time()
        with self.lock:
            if self.last_poll is None:
                self.last_poll = now
            dt = min(now - self.last_poll, 0.25)     # cap catch-up
            self.last_poll = now
            n = int(dt * self.env.CTRL_FREQ)
            for _ in range(n):
                self.env.step(self.rpm)
                self.t += 1.0 / self.env.CTRL_FREQ
            return self.state()

    def state(self):
        from PIL import Image

        from gym_pybullet_adrp_tpu.envs import core

        sv = np.asarray(core.state_vector(self.env._state))
        pos = sv[0, 0:3]
        img = np.asarray(self._render(pos.astype(np.float32)))
        buf = io.BytesIO()
        Image.fromarray(img).resize((512, 384), Image.NEAREST).save(
            buf, format="PNG"
        )
        return {
            "t": self.t,
            "pos": pos.tolist(),
            "rpy": sv[0, 7:10].tolist(),
            "vel": sv[0, 10:13].tolist(),
            "rpm": self.rpm[0].tolist(),
            "png": base64.b64encode(buf.getvalue()).decode(),
        }

    def set_rpm(self, values):
        with self.lock:
            self.rpm = np.clip(
                np.asarray(values, dtype=np.float32).reshape(1, 4),
                0.0, self.env.MAX_RPM,
            )

    def reset(self):
        with self.lock:
            self.env.reset(seed=0)
            self.t = 0.0


def make_handler(sim: LiveSim):
    class H(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _send(self, body, ctype="application/json"):
            self.send_response(200)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/":
                page = PAGE.replace(
                    "MAXRPM", str(int(sim.env.MAX_RPM))
                ).replace("HOVERRPM", str(int(sim.env.HOVER_RPM)))
                self._send(page.encode(), "text/html")
            elif self.path == "/state":
                self._send(json.dumps(sim.step_to_now()).encode())
            else:
                self.send_error(404)

        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            body = self.rfile.read(n)
            if self.path == "/rpm":
                sim.set_rpm(json.loads(body or b"[0,0,0,0]"))
                self._send(b"{}")
            elif self.path == "/reset":
                sim.reset()
                self._send(b"{}")
            else:
                self.send_error(404)

    return H


def serve(port=8008, platform=None):
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)
    sim = LiveSim()
    httpd = ThreadingHTTPServer(("127.0.0.1", port), make_handler(sim))
    print(f"live fly: http://localhost:{port}  (ctrl-c to stop)",
          flush=True)
    return httpd


if __name__ == "__main__":
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--port", type=int, default=8008)
    ap.add_argument("--platform", default="cpu",
                    help="cpu avoids per-step TPU tunnel latency in the "
                         "interactive loop")
    args = ap.parse_args()
    serve(args.port, args.platform).serve_forever()
