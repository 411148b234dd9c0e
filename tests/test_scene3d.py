"""World-space spatial scene: listener pose math + live emitter pushes
(scene3d.py)."""

import numpy as np
import pytest

from firewheel_tpu import AudioListener, SpatialScene
from firewheel_tpu.nodes.spatial import Spatializer3DNode


def test_identity_pose_is_passthrough():
    lis = AudioListener()
    assert np.allclose(lis.to_listener_frame((1.0, 2.0, -3.0)),
                       (1.0, 2.0, -3.0))


def test_rotated_listener():
    # listener at origin facing +x: an emitter at (5, 0, 0) is straight
    # ahead -> (0, 0, -5); an emitter at (0, 0, -5) (world) is to the LEFT
    lis = AudioListener(forward=(1.0, 0.0, 0.0))
    assert np.allclose(lis.to_listener_frame((5.0, 0.0, 0.0)), (0, 0, -5))
    x, y, z = lis.to_listener_frame((0.0, 0.0, -5.0))
    assert x < -4.9 and abs(y) < 1e-9 and abs(z) < 1e-9


def test_translated_listener():
    lis = AudioListener(position=(10.0, 0.0, 0.0))
    assert np.allclose(lis.to_listener_frame((10.0, 1.0, -2.0)), (0, 1, -2))


def test_up_reorthogonalized():
    # a sloppy, non-orthogonal up still yields an orthonormal frame
    lis = AudioListener(forward=(0, 0, -1), up=(0.2, 1.0, -0.3))
    f = lis.to_listener_frame
    m = np.stack([np.array(f(v)) for v in
                  ((1, 0, 0), (0, 1, 0), (0, 0, -1))])
    assert np.allclose(m @ m.T, np.eye(3), atol=1e-9)


def test_scene_pushes_node_positions():
    scene = SpatialScene()
    sp = Spatializer3DNode()
    scene.add("e", sp, world_pos=(3.0, 0.0, -4.0))
    assert np.allclose(sp.position(), (3.0, 0.0, -4.0))
    # listener turns to face the emitter: it moves dead ahead at range 5
    scene.set_listener(forward=(3.0, 0.0, -4.0))
    x, y, z = sp.position()
    assert abs(x) < 1e-9 and abs(y) < 1e-9 and abs(z + 5.0) < 1e-9
    # emitter moves with the listener frame applied
    scene.move("e", (0.0, 2.0, 0.0))
    assert abs(sp.position()[1] - 2.0) < 1e-9
    scene.remove("e")
    with pytest.raises(KeyError):
        scene.move("e", (0, 0, 0))


def test_degenerate_up_parallel_forward():
    lis = AudioListener(forward=(0, 1, 0), up=(0, 1, 0))
    # still produces a valid frame (arbitrary roll)
    x, y, z = lis.to_listener_frame((0.0, 5.0, 0.0))
    assert abs(z + 5.0) < 1e-9
