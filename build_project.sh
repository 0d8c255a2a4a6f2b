#!/bin/bash
# Local wheel build + import smoke test
# (capability parity with reference build_project.sh:1-7)
set -e
pip install --quiet build
python -m build --wheel
pip install --force-reinstall dist/*.whl
python -c "import gym_pybullet_adrp_tpu; print('import OK', gym_pybullet_adrp_tpu.__version__)"
