"""Deploy OpenVLA as an HTTP action server (reference `vla-scripts/deploy.py`).

Same CLI fields as the reference `DeployConfig` (deploy.py:110-144); serves
POST /act with the json-numpy wire format. Works against unmodified reference
eval clients (e.g. the ALOHA client, `run_aloha_eval.py`).
"""

from __future__ import annotations

import dataclasses
import sys
from pathlib import Path
from typing import Optional, Tuple, Union

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


@dataclasses.dataclass
class DeployConfig:
    # fmt: off
    host: str = "0.0.0.0"
    port: int = 8777

    model_family: str = "openvla"
    pretrained_checkpoint: Union[str, Path] = ""

    use_l1_regression: bool = True
    use_diffusion: bool = False
    num_diffusion_steps: int = 50
    use_film: bool = False
    num_images_in_input: int = 3
    use_proprio: bool = True

    center_crop: bool = True
    # Run preprocessing+unnorm inside the compiled serving program
    # (policy.serve_action_chunk; L1 head only, skips host JPEG)
    device_preprocess: bool = False
    num_open_loop_steps: int = 25

    unnorm_key: Union[str, Path] = ""
    use_relative_actions: bool = False

    load_in_8bit: bool = False
    load_in_4bit: bool = False

    # Compile the serving program on a synthetic observation BEFORE binding
    # the port: the first XLA compile is tens of seconds, which would blow
    # through a robot client's request timeout (the ALOHA loop runs at 25 Hz)
    warmup: bool = True
    # Raw camera frame geometry (H, W) for the synthetic warmup observation.
    # Under device_preprocess the compiled program is shape-specialized to
    # the RAW frame size, so this must match what clients actually send —
    # a mismatch means the first real request pays a fresh XLA compile.
    warmup_image_hw: Tuple[int, int] = (256, 256)

    seed: int = 7
    # fmt: on


class OpenVLAServer:
    """Reference `OpenVLAServer` (deploy.py:47-107) on the TPU policy stack."""

    def __init__(self, cfg: DeployConfig):
        from experiments.robot.openvla_utils import (
            get_action_head,
            get_processor,
            get_proprio_projector,
            get_vla,
            get_vla_action,
        )
        from openvla_oft_tpu.serving.server import ActionServer

        self.cfg = cfg
        self.vla = get_vla(cfg)
        self.proprio_projector = None
        if cfg.use_proprio:
            try:
                self.proprio_projector = get_proprio_projector(
                    cfg, self.vla.cfg.llm_dim, self.vla.platform.proprio_dim)
            except (AssertionError, FileNotFoundError):
                pass  # projector may already live in the main checkpoint
        self.action_head = None
        if cfg.use_l1_regression or cfg.use_diffusion:
            try:
                self.action_head = get_action_head(cfg, self.vla.cfg.llm_dim)
            except (AssertionError, FileNotFoundError):
                pass
        if self.vla.norm_stats:
            # Hard-assert at STARTUP like the reference (deploy.py:68): with
            # stats loaded, an empty/wrong unnorm_key would otherwise make
            # every /act request return 'error' (HTTP 200) at runtime.
            assert cfg.unnorm_key, \
                "unnorm_key must be set when the checkpoint carries norm_stats"
            assert str(cfg.unnorm_key) in self.vla.norm_stats, \
                f"Action un-norm key {cfg.unnorm_key} not found in norm_stats!"
        self.processor = get_processor(cfg)
        self._get_vla_action = get_vla_action
        print(f"[deploy] platform={self.vla.platform.name} "
              f"proprio_dim={self.vla.platform.proprio_dim} "
              f"norm_stats={list(self.vla.norm_stats or {})}")
        self._server = ActionServer(self.predict)
        if cfg.warmup:
            self._warmup()

    def _warmup(self):
        """One synthetic predict through the exact serving geometry so the
        XLA compile happens at startup, not on the first client request.
        Later requests reuse the cache (prompts share the static bucket)."""
        import time

        import numpy as np

        h, w = getattr(self.cfg, "warmup_image_hw", (256, 256))
        obs = {"full_image": np.zeros((h, w, 3), np.uint8)}
        for i in range(getattr(self.cfg, "num_images_in_input", 1) - 1):
            obs[f"wrist_image_{i}"] = np.zeros((h, w, 3), np.uint8)
        if self.cfg.use_proprio:
            obs["state"] = np.zeros(self.vla.platform.proprio_dim, np.float32)
        t0 = time.perf_counter()
        self.predict(obs, "do the task")
        print(f"[deploy] warmup compile+run: {time.perf_counter() - t0:.1f}s")

    def predict(self, observation, instruction):
        import numpy as np

        actions = self._get_vla_action(
            self.cfg, self.vla, self.processor, observation, instruction,
            action_head=self.action_head,
            proprio_projector=self.proprio_projector,
            use_film=self.cfg.use_film)
        return np.stack(actions)

    def run(self, host=None, port=None, background: bool = False):
        return self._server.run(host or self.cfg.host, port or self.cfg.port,
                                background=background)


def deploy(cfg: DeployConfig) -> None:
    server = OpenVLAServer(cfg)
    print(f"[deploy] serving /act on {cfg.host}:{cfg.port}")
    server.run()


if __name__ == "__main__":
    from openvla_oft_tpu.utils.cli import parse_args

    deploy(parse_args(DeployConfig))
