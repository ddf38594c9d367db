"""Multi-host helpers on the virtual 8-device mesh."""

import jax
import numpy as np

from trtllm_llama_tpu.parallel.multihost import (
    is_scheduler_host, pod_mapping, pod_mesh,
)


def test_pod_mesh_shapes():
    mesh = pod_mesh(tp=4)
    assert dict(mesh.shape) == {"dp": 2, "pp": 1, "sp": 1, "ep": 1, "tp": 4}
    mapping = pod_mapping(mesh)
    assert mapping.dp == 2 and mapping.tp == 4 and mapping.sp == 1


def test_pod_mesh_with_sp_axis():
    mesh = pod_mesh(tp=2, sp=2)
    assert dict(mesh.shape) == {"dp": 2, "pp": 1, "sp": 2, "ep": 1, "tp": 2}
    mapping = pod_mapping(mesh)
    assert (mapping.dp, mapping.sp, mapping.tp) == (2, 2, 2)


def test_pod_mesh_with_pp_axis():
    mesh = pod_mesh(tp=2, pp=2)
    assert dict(mesh.shape) == {"dp": 2, "pp": 2, "sp": 1, "ep": 1, "tp": 2}
    assert pod_mapping(mesh).pp == 2


def test_pod_mesh_default_covers_all_devices():
    mesh = pod_mesh()
    assert (mesh.shape["dp"] * mesh.shape["pp"] * mesh.shape["sp"]
            * mesh.shape["ep"] * mesh.shape["tp"] == jax.device_count())


def test_pod_mesh_bad_factorization():
    try:
        pod_mesh(tp=3)
        assert False
    except ValueError:
        pass


def test_scheduler_host():
    assert is_scheduler_host() is True   # single-process test env
