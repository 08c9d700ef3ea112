"""OBJ/MTL parsing behavior, mirroring obj_loader.cpp semantics."""
import numpy as np
import pytest

from voxelray_tpu.io import meshes
from voxelray_tpu.io.objload import ObjLoader, load_mesh, write_obj


def test_roundtrip_cube(tmp_path):
    v, f = meshes.cube()
    path = tmp_path / "cube.obj"
    write_obj(str(path), v, f)
    raw = load_mesh(str(path))
    assert np.allclose(raw.vertices, v)
    assert np.array_equal(raw.faces, f)


def test_missing_file_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        load_mesh(str(tmp_path / "nope.obj"))


def test_quad_fan_triangulation(tmp_path):
    path = tmp_path / "quad.obj"
    path.write_text(
        "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\nf 1 2 3 4\n"
    )
    raw = load_mesh(str(path))
    assert raw.faces.shape == (2, 3)
    assert raw.faces.tolist() == [[0, 1, 2], [0, 2, 3]]


def test_negative_indices(tmp_path):
    path = tmp_path / "neg.obj"
    path.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nf -3 -2 -1\n")
    raw = load_mesh(str(path))
    assert raw.faces.tolist() == [[0, 1, 2]]


def test_loader_flat_normals_when_absent(tmp_path):
    path = tmp_path / "tri.obj"
    path.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\n")
    model = ObjLoader().load_model(str(path))
    # flat normal of CCW triangle in XY plane is +Z (obj_loader.cpp:108-121)
    assert np.allclose(model.normals, [[0, 0, 1]] * 3)
    assert np.array_equal(model.indices, [0, 1, 2])


def test_loader_default_material(tmp_path):
    path = tmp_path / "tri.obj"
    path.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\n")
    model = ObjLoader().load_model(str(path))
    assert model.materials.shape[0] == 1
    # MaterialObj defaults: diffuse (1,1,0), illum 0 (obj_loader.h:32-52)
    assert np.allclose(model.materials[0, 3:6], [1, 1, 0])
    assert model.materials[0, 18] == 0
    assert model.mat_index.tolist() == [0]


def test_mtl_parsing(tmp_path):
    (tmp_path / "m.mtl").write_text(
        "newmtl green\nKd 0.1 0.8 0.3\nNs 32\nillum 3\n"
    )
    path = tmp_path / "tri.obj"
    path.write_text(
        "mtllib m.mtl\nv 0 0 0\nv 1 0 0\nv 0 1 0\nusemtl green\nf 1 2 3\n"
    )
    raw = load_mesh(str(path))
    assert len(raw.materials) == 1
    assert raw.materials[0].diffuse == (0.1, 0.8, 0.3)
    assert raw.materials[0].shininess == 32
    assert raw.materials[0].illum == 3
    assert raw.face_material_ids.tolist() == [0]


def test_texcoord_v_flip(tmp_path):
    path = tmp_path / "tri.obj"
    path.write_text(
        "v 0 0 0\nv 1 0 0\nv 0 1 0\n"
        "vt 0 0.25\nvt 1 0.25\nvt 0 1\n"
        "f 1/1 2/2 3/3\n"
    )
    model = ObjLoader().load_model(str(path))
    assert np.allclose(model.texcoords[:, 1], [0.75, 0.75, 0.0])


def test_mesh_registry():
    for name in ("cube", "plane", "bunny", "sphere", "knot"):
        v, f = meshes.make_scene_mesh(name)
        assert v.ndim == 2 and v.shape[1] == 3
        assert f.ndim == 2 and f.shape[1] == 3
        assert f.max() < len(v)


def test_knot1m_size():
    v, f = meshes.torus_knot(2, 3, 1024, 512)
    assert len(f) == 1024 * 512 * 2  # ~1.05M triangles


def test_material_dedup_map():
    """addMatrialIfNeeded semantics (voxelgrid.hpp:102-114): value-equal
    materials share one index; new ones append in insertion order."""
    from voxelray_tpu.io.objload import Material, MaterialDedup

    d = MaterialDedup()
    a = Material(diffuse=(1.0, 0.0, 0.0))
    b = Material(diffuse=(0.0, 1.0, 0.0))
    assert d.add_material_if_needed(a) == 0
    assert d.add_material_if_needed(b) == 1
    # a value-equal copy dedups to the existing index
    assert d.add_material_if_needed(Material(diffuse=(1.0, 0.0, 0.0))) == 0
    assert d.add_material_if_needed(b) == 1
    rows = d.rows()
    assert rows.shape == (2, 20)
    assert np.allclose(rows[0], a.as_row())
