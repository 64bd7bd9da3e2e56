"""Driver hooks: dryrun_multichip must keep compiling+running on a virtual
mesh (the driver invokes it with N forced host devices)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_dryrun_multichip_8():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_entry_shapes():
    import numpy as np
    import __graft_entry__ as ge
    fn, args = ge.entry()
    variables, clip, audio = args
    assert clip.shape == (8, 16, 112, 112, 3) and clip.dtype == np.uint8
    assert audio.shape == (8, 1, 64, 1001)
    # jittable check is the driver's job on TPU; here validate structure
    assert "params" in variables
