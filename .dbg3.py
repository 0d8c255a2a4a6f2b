import sys
sys.path.insert(0, "scripts")
import importlib.util
spec = importlib.util.spec_from_file_location("er", "scripts/eval_race.py")
er = importlib.util.module_from_spec(spec); spec.loader.exec_module(er)
out = er.evaluate("results/gs_full_policy.msgpack", "getting_started", 128)
print(out)
