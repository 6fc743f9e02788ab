"""OBJ loading tests (a capability the reference only slated, README.md:30)."""
import numpy as np
import jax

from cuda_path_tracer_ss_tpu.models.camera import Camera
from cuda_path_tracer_ss_tpu.models.scene import MaterialSpec, SceneBuilder, translate, scale
from cuda_path_tracer_ss_tpu.render.integrator import camera_arrays, render
from cuda_path_tracer_ss_tpu.utils.obj import add_obj_mesh, parse_obj

CUBE = """
# unit cube
v -0.5 -0.5 -0.5
v  0.5 -0.5 -0.5
v  0.5  0.5 -0.5
v -0.5  0.5 -0.5
v -0.5 -0.5  0.5
v  0.5 -0.5  0.5
v  0.5  0.5  0.5
v -0.5  0.5  0.5
f 1 4 3 2
f 5 6 7 8
f 1 2 6 5
f 8 7 3 4
f 3 7 6 2
f 8 4 1 5
"""

TRI_WITH_NORMALS = """
v 0 0 0
v 1 0 0
v 0 1 0
vn 0 0 1
f 1//1 2//1 3//1
"""


def test_parse_quad_cube_fan_triangulates():
    v, f, n = parse_obj(CUBE)
    assert v.shape == (8, 3)
    assert f.shape == (12, 3)       # 6 quads -> 12 triangles
    assert n.shape == (12, 3, 3)
    lens = np.linalg.norm(n, axis=-1)
    np.testing.assert_allclose(lens, 1.0, rtol=1e-5)


def test_explicit_normals_used():
    v, f, n = parse_obj(TRI_WITH_NORMALS)
    np.testing.assert_array_equal(f, [[0, 1, 2]])
    np.testing.assert_allclose(n[0], [[0, 0, 1]] * 3)


def test_smooth_normals_point_outward_on_cube():
    v, f, n = parse_obj(CUBE)
    # smooth vertex normals on a cube point along the corner diagonals
    for tri, tri_n in zip(f, n):
        for vi, vn in zip(tri, tri_n):
            outward = v[vi] / np.linalg.norm(v[vi])
            assert np.dot(vn, outward) > 0.9


def test_negative_indices():
    v, f, n = parse_obj("v 0 0 0\nv 1 0 0\nv 0 1 0\nf -3 -2 -1\n")
    np.testing.assert_array_equal(f, [[0, 1, 2]])


def test_negative_indices_interleaved():
    # OBJ spec: negative indices are relative to the vertex count at the
    # face statement, not end-of-file.
    text = ("v 0 0 0\nv 1 0 0\nv 0 1 0\nf -3 -2 -1\n"
            "v 5 0 0\nv 6 0 0\nv 5 1 0\nf -3 -2 -1\n")
    v, f, n = parse_obj(text)
    np.testing.assert_array_equal(f, [[0, 1, 2], [3, 4, 5]])


def test_obj_mesh_renders():
    # emissive cube in front of the camera -> bright pixels at the center
    b = SceneBuilder()
    m = b.add_material(MaterialSpec(emission=(1.0, 0.5, 0.25)))
    n_tris = add_obj_mesh(b, CUBE, m,
                          transform=translate((0, 0, -3)) @ scale((2, 2, 2)),
                          from_text=True)
    assert n_tris == 12
    scene = b.build()
    img = np.asarray(render(scene, camera_arrays(Camera()), 16, 16, 1,
                            0, max_bounces=2,
                            live_cutoff=None))
    center = img[8, 8]
    np.testing.assert_allclose(center, [1.0, 0.5, 0.25], atol=1e-5)
    assert img[0, 0].max() == 0.0   # corners miss the cube -> background
