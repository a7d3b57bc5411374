"""End-to-end HTTP serving bench: the deploy server over localhost.

The 25 Hz ALOHA / LIBERO chunk-cadence claims rest on `serve_action_chunk`
DEVICE time (bench.py); the reference's actual serving contract is HTTP
POST /act with the json-numpy wire format (`vla-scripts/deploy.py:47-107`,
clients: `experiments/robot/aloha/run_aloha_eval.py`). This bench measures
what a robot client actually pays per chunk against the in-repo server
(`vla_scripts/deploy.py` on `serving/server.py`):

  p50/p99/mean wall time per POST /act over localhost, including
  json-numpy encode (client) + HTTP + json-numpy decode (server) +
  host preprocessing + device compute + the response path back,

and itemizes the gap to the device-only number by separately timing the
client-side wire costs (encode/decode) and payload sizes.

Server is launched as a subprocess (it owns the TPU); the client loop runs
in this process using stdlib urllib — no extra deps. The first request may
still hit a shape-specialized recompile if --warmup_hw mismatches the
client frames, so the bench sends identical geometry.

Usage:
  python vla_scripts/bench_deploy.py --quant int8 --n 50
  python vla_scripts/bench_deploy.py --no_server  # reuse a running server
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
import urllib.error
import urllib.request
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from openvla_oft_tpu.serving import json_numpy


def make_observation(num_images: int, proprio_dim: int, hw=(256, 256),
                     seed=0):
    rng = np.random.default_rng(seed)
    h, w = hw
    obs = {"full_image": rng.integers(0, 255, (h, w, 3), dtype=np.uint8)}
    for i in range(num_images - 1):
        obs[f"wrist_image_{i}"] = rng.integers(0, 255, (h, w, 3),
                                               dtype=np.uint8)
    obs["state"] = rng.normal(size=(proprio_dim,)).astype(np.float32)
    obs["instruction"] = "pick up the black bowl and place it on the plate"
    return obs


def post_act(url: str, body: bytes, timeout: float):
    req = urllib.request.Request(url, data=body,
                                 headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return r.read()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--port", type=int, default=0,
                    help="0 = pick a free ephemeral port (a stale server "
                         "from an earlier run answering on a fixed port "
                         "would silently bench the WRONG config)")
    ap.add_argument("--n", type=int, default=50)
    ap.add_argument("--quant", default="int8", choices=["bf16", "int8"])
    ap.add_argument("--model", default="7b", choices=["7b", "tiny"],
                    help="tiny = random:tiny server: measures the WIRE+host "
                         "overhead exactly (device time is the bench.py "
                         "number); 7b needs ~13.5 GB free HBM at startup")
    ap.add_argument("--num_images", type=int, default=2)
    ap.add_argument("--platform", default="libero",
                    choices=["libero", "aloha"])
    ap.add_argument("--double_encode", action="store_true",
                    help="reference client's json-numpy double-encoding")
    ap.add_argument("--no_server", action="store_true",
                    help="assume a server is already listening on --port")
    ap.add_argument("--startup_timeout", type=float, default=900.0)
    args = ap.parse_args()

    if args.port == 0:
        import socket

        with socket.socket() as sk:
            sk.bind(("127.0.0.1", 0))
            args.port = sk.getsockname()[1]

    proprio_dim = {"libero": 8, "aloha": 14}[args.platform]
    obs = make_observation(args.num_images, proprio_dim)
    url = f"http://127.0.0.1:{args.port}/act"

    proc = None
    if not args.no_server:
        repo = Path(__file__).resolve().parents[1]
        cmd = [sys.executable, "-u", str(repo / "vla_scripts/deploy.py"),
               "--pretrained_checkpoint", f"random:{args.model}",
               "--host", "127.0.0.1", "--port", str(args.port),
               "--num_images_in_input", str(args.num_images),
               "--use_proprio", "True",
               "--device_preprocess", "True",
               "--load_in_8bit", str(args.quant == "int8"),
               # platform is detected from hint strings (openvla_utils.py::
               # _platform_from_cfg); the key matches the synthetic stats
               # entry get_vla creates under OPENVLA_FAKE_NORM_STATS=1.
               "--unnorm_key", f"{args.platform}_bench",
               ]
        env = dict(os.environ)
        # random:7b carries no dataset statistics; synthesize identity
        # bounds so the full unnorm path runs (openvla_utils.get_vla).
        env["OPENVLA_FAKE_NORM_STATS"] = "1"
        # zeros via eval_shape: latency is value-independent, and the full
        # 13.5 GB random bf16 init can exceed the chip's free HBM when the
        # tunnel's real capacity is degraded (observed 12 GB).
        env["OPENVLA_ZERO_INIT"] = "1"
        log = open("/tmp/bench_deploy_server.log", "w")
        proc = subprocess.Popen(cmd, cwd=repo, env=env, stdout=log,
                                stderr=subprocess.STDOUT)
        print(f"[bench_deploy] server pid={proc.pid} "
              f"(log /tmp/bench_deploy_server.log)")

    # --- wire encode once to measure encode cost + payload size ---
    t0 = time.perf_counter()
    if args.double_encode:
        body = json.dumps(
            {"encoded": json_numpy.dumps(obs)}).encode()
    else:
        body = json_numpy.dumps(obs).encode()
    encode_ms = (time.perf_counter() - t0) * 1e3

    # --- wait for the server (startup = model init + XLA warmup) ---
    deadline = time.time() + args.startup_timeout
    last_err = None
    while time.time() < deadline:
        if proc is not None and proc.poll() is not None:
            print("[bench_deploy] server exited early; tail of log:")
            print(Path("/tmp/bench_deploy_server.log").read_text()[-2000:])
            sys.exit(1)
        try:
            resp = post_act(url, body, timeout=120)
            if b"error" not in resp[:20]:
                break
            last_err = resp[:200]
        except (urllib.error.URLError, ConnectionError, OSError) as e:
            last_err = e
        time.sleep(5)
    else:
        print(f"[bench_deploy] server never became ready: {last_err}")
        sys.exit(1)

    # --- timed loop ---
    lat = []
    decode_ms = 0.0
    for i in range(args.n):
        t0 = time.perf_counter()
        resp = post_act(url, body, timeout=120)
        t1 = time.perf_counter()
        out = json_numpy.loads(resp.decode())
        if isinstance(out, str):
            if out == "error" or not args.double_encode:
                raise RuntimeError(f"server error: {out[:200]}")
            # double-encode: second decode unwraps the inner json-numpy
            # string (some server stacks already unwrap one level)
            out = json_numpy.loads(out)
        t2 = time.perf_counter()
        lat.append((t1 - t0) * 1e3)
        decode_ms += (t2 - t1) * 1e3
        if i == 0:
            action = np.asarray(out)
            assert action.ndim == 2 and np.isfinite(action).all(), action
            print(f"[bench_deploy] chunk shape {action.shape}, "
                  f"request {len(body) / 1e6:.2f} MB, "
                  f"response {len(resp) / 1e3:.1f} kB")

    lat = np.asarray(lat)
    summary = {
        "metric": "http_act_latency",
        "platform": args.platform,
        "model": args.model,
        "quant": args.quant,
        "n": args.n,
        "p50_ms": round(float(np.percentile(lat, 50)), 2),
        "p99_ms": round(float(np.percentile(lat, 99)), 2),
        "mean_ms": round(float(lat.mean()), 2),
        "client_encode_ms": round(encode_ms, 2),
        "client_decode_ms": round(decode_ms / args.n, 3),
        "request_mb": round(len(body) / 1e6, 3),
    }
    print(json.dumps(summary))

    if proc is not None:
        proc.terminate()
        try:
            proc.wait(timeout=30)
        except subprocess.TimeoutExpired:
            proc.kill()


if __name__ == "__main__":
    main()
