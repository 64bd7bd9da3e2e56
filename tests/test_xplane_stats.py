"""Unit tests for scripts/xplane_stats.py (profiler-trace parsing).

The proto-construction tests import TensorFlow's tsl xplane schema,
which is a heavy import on this 1-CPU box, so they are gated behind
AUFORMER_TEST_TF=1; the pure-python helpers are always tested.
"""
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

from xplane_stats import categorize, newest_xplane  # noqa: E402


def test_categorize():
    assert categorize("fusion.1023") == "fusion"
    assert categorize("%fusion.7") == "fusion"
    assert categorize("convolution") == "convolution"
    assert categorize("all-reduce.3") == "all-reduce"
    assert categorize("dot_general.1") == "dot_general"
    assert categorize("a/b/dynamic-slice.42") == "dynamic-slice"


def test_newest_xplane_missing(tmp_path):
    assert newest_xplane(str(tmp_path)) is None


@pytest.mark.skipif(os.environ.get("AUFORMER_TEST_TF") != "1",
                    reason="heavy TF import; set AUFORMER_TEST_TF=1")
def test_op_stats_synthetic(tmp_path):
    env = dict(os.environ,
               PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION="python",
               JAX_PLATFORMS="cpu")
    code = f"""
import json, sys
sys.path.insert(0, {os.path.join(REPO, 'scripts')!r})
from tensorflow.tsl.profiler.protobuf import xplane_pb2
from xplane_stats import op_stats

space = xplane_pb2.XSpace()
plane = space.planes.add()
plane.name = "/device:TPU:0 (chip)"
m1 = plane.event_metadata[1]; m1.id = 1; m1.name = "fusion.1"
m2 = plane.event_metadata[2]; m2.id = 2; m2.name = "convolution.9"
line = plane.lines.add(); line.name = "XLA Ops"
for mid, dur in [(1, 3_000_000), (2, 1_000_000), (1, 2_000_000)]:
    ev = line.events.add(); ev.metadata_id = mid; ev.duration_ps = dur
path = {str(tmp_path / 'x.xplane.pb')!r}
open(path, "wb").write(space.SerializeToString())

s = op_stats(path)
dev, = s["devices"]
assert dev["op_line"] == "XLA Ops"
assert abs(dev["busy_us"] - 6.0) < 1e-9
assert abs(dev["per_op_us"]["fusion.1"] - 5.0) < 1e-9
assert abs(dev["per_op_us"]["convolution.9"] - 1.0) < 1e-9
print("OK")
"""
    proc = subprocess.run([sys.executable, "-c", code], env=env,
                          capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "OK" in proc.stdout
