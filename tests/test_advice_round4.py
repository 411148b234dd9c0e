"""Round-4 advisor findings, pinned.

1. serving._snap_dict deep-copies container attributes — a configure
   callback mutating something NESTED inside a saved list/dict must not
   alias into other sessions' snapshots.
2. granular long-clip precision: tests/test_granular.py::
   test_long_clip_precision_past_2pow24.
3. vorbis opaque-struct margins: doc/constant change (no behavior).
4. os_audio overflow docstring: wording only.
"""

import numpy as np

from firewheel_tpu.serving import _snap_dict


def test_snap_dict_deep_copies_nested_containers():
    d = {
        "scalar": 3.5,
        "lst": [{"x": 1}, [2, 3]],
        "dct": {"inner": [4]},
        "arr": np.zeros(4, np.float32),  # kept by reference (replaced,
    }                                     # never mutated, per contract)
    snap = _snap_dict(d)
    d["lst"][0]["x"] = 99
    d["lst"][1].append(42)
    d["dct"]["inner"].append(5)
    assert snap["lst"][0]["x"] == 1
    assert snap["lst"][1] == [2, 3]
    assert snap["dct"]["inner"] == [4]
    assert snap["arr"] is d["arr"]
    assert snap["scalar"] == 3.5


def test_snap_dict_restore_isolation_both_ways():
    """A snapshot restored into the template must not alias the stored
    snapshot either (restore uses _snap_dict again)."""
    base = {"cmds": [["play", 0]]}
    snap = _snap_dict(base)
    restored = _snap_dict(snap)
    restored["cmds"][0].append("mutated")
    assert snap["cmds"] == [["play", 0]]
