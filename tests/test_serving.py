"""Serving tests: json-numpy codec, /act end-to-end over a real socket with a
tiny random policy, client helper, open-loop slicing."""

import dataclasses
import socket
import threading
import time

import numpy as np
import pytest

from openvla_oft_tpu.serving import json_numpy
from openvla_oft_tpu.serving.server import ActionServer, get_action_from_server


def test_json_numpy_roundtrip(rng):
    obs = {"full_image": (rng.random((32, 32, 3)) * 255).astype(np.uint8),
           "state": rng.standard_normal(8).astype(np.float64),
           "instruction": "pick up the cube"}
    s = json_numpy.dumps(obs)
    back = json_numpy.loads(s)
    np.testing.assert_array_equal(back["full_image"], obs["full_image"])
    np.testing.assert_array_equal(back["state"], obs["state"])
    assert back["instruction"] == obs["instruction"]
    # double-encoded payloads
    wrapped = json_numpy.dumps({"encoded": json_numpy.dumps(obs)})
    outer = json_numpy.loads(wrapped)
    inner = json_numpy.loads(outer["encoded"])
    np.testing.assert_array_equal(inner["full_image"], obs["full_image"])


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_act_server_end_to_end(rng):
    """Stdlib server + urllib client, echoing a deterministic policy."""

    def predict(observation, instruction):
        img = observation["full_image"]
        assert instruction == "stack the bowls"
        return np.full((8, 7), float(img.mean()) / 255.0)

    server = ActionServer(predict)
    port = _free_port()
    httpd = server._run_stdlib("127.0.0.1", port, background=True)
    try:
        obs = {"full_image": np.full((16, 16, 3), 128, np.uint8),
               "instruction": "stack the bowls"}
        out = get_action_from_server(obs, f"http://127.0.0.1:{port}/act")
        out = np.asarray(out)
        assert out.shape == (8, 7)
        np.testing.assert_allclose(out, 128 / 255.0, rtol=1e-6)
    finally:
        httpd.shutdown()


def test_openvla_server_with_tiny_policy(rng):
    """Full deploy path: tiny random policy behind /act."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    from vla_scripts.deploy import DeployConfig, OpenVLAServer

    cfg = DeployConfig(pretrained_checkpoint="random:tiny",
                       use_l1_regression=True, use_proprio=False,
                       num_images_in_input=1, num_open_loop_steps=8)
    server = OpenVLAServer(cfg)
    port = _free_port()
    httpd = server.run(host="127.0.0.1", port=port, background=True)
    try:
        obs = {"full_image": (rng.random((64, 64, 3)) * 255).astype(np.uint8),
               "instruction": "put the cup on the plate"}
        out = np.asarray(get_action_from_server(
            obs, f"http://127.0.0.1:{port}/act"))
        assert out.shape == (8, 7)  # LIBERO chunk geometry, open-loop sliced
        assert np.isfinite(out).all()
    finally:
        httpd.shutdown()


def test_openvla_server_warmup_multi_image_proprio():
    """Startup warmup compiles the serving program on a synthetic observation
    matching the configured geometry (wrist cams + proprio state) — the first
    real client request must not pay the XLA compile."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    from vla_scripts.deploy import DeployConfig, OpenVLAServer

    cfg = DeployConfig(pretrained_checkpoint="random:tiny",
                       use_l1_regression=True, use_proprio=True,
                       num_images_in_input=2, num_open_loop_steps=4)
    server = OpenVLAServer(cfg)  # warmup=True default runs inside __init__
    # a post-warmup predict with the same geometry reuses the compile cache
    obs = {"full_image": np.zeros((64, 64, 3), np.uint8),
           "wrist_image": np.zeros((64, 64, 3), np.uint8),
           "state": np.zeros(server.vla.platform.proprio_dim, np.float32)}
    # the real property: warmup populated the jit cache for the serving
    # geometry, so a client request triggers NO new compile (wall-clock
    # bounds are vacuous on fast hosts and flaky on contended ones)
    n_compiles_before = server.vla._predict_jit._cache_size()
    assert n_compiles_before >= 1, "warmup never compiled the predict path"
    out = server.predict(obs, "stack the blocks")
    assert out.shape[1] == server.vla.platform.action_dim
    assert np.isfinite(out).all()
    n_compiles_after = server.vla._predict_jit._cache_size()
    assert n_compiles_after == n_compiles_before, \
        f"client request recompiled ({n_compiles_before} -> " \
        f"{n_compiles_after} cache entries) — warmup geometry mismatch"


def test_json_numpy_edge_dtypes(rng):
    """float16/bool/int64, 0-d scalars, non-contiguous views, and nested
    containers must all survive the wire format (reference clients send
    arbitrary observation dicts)."""
    obs = {
        "half": rng.standard_normal((4, 3)).astype(np.float16),
        "flags": np.array([[True, False], [False, True]]),
        "steps": np.arange(5, dtype=np.int64),
        "scalar": np.float32(0.25),
        "zero_d": np.array(7, dtype=np.int32),
        "nested": {"inner": [np.arange(3, dtype=np.float32), "text", 3]},
        # transpose -> non-contiguous; encoder must emit the logical layout
        "strided": rng.standard_normal((3, 5)).T,
    }
    back = json_numpy.loads(json_numpy.dumps(obs))
    np.testing.assert_array_equal(back["half"], obs["half"])
    assert back["half"].dtype == np.float16
    np.testing.assert_array_equal(back["flags"], obs["flags"])
    assert back["flags"].dtype == np.bool_
    np.testing.assert_array_equal(back["steps"], obs["steps"])
    assert back["steps"].dtype == np.int64
    # numpy scalars degrade to plain JSON numbers (reference behavior)
    assert back["scalar"] == 0.25
    np.testing.assert_array_equal(back["zero_d"], obs["zero_d"])
    assert back["zero_d"].shape == ()
    np.testing.assert_array_equal(back["nested"]["inner"][0],
                                  obs["nested"]["inner"][0])
    assert back["nested"]["inner"][1:] == ["text", 3]
    np.testing.assert_array_equal(back["strided"], obs["strided"])
