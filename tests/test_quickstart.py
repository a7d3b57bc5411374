"""Quickstart example end-to-end in CI (reference README.md:55-69 flow).

Runs `examples/quickstart.py` main against the committed observation fixture
(`experiments/robot/libero/sample_libero_spatial_observation.pkl`) on the
tiny registry model — the zero-egress stand-in for the reference's
`moojink/openvla-7b-oft-finetuned-libero-spatial` download.
"""

import numpy as np
import pytest

from examples.quickstart import FIXTURE, QuickstartConfig, load_observation, main


def test_fixture_schema():
    assert FIXTURE.exists(), "committed quickstart fixture missing"
    obs = load_observation(None)
    assert obs["full_image"].shape == (256, 256, 3)
    assert obs["full_image"].dtype == np.uint8
    assert obs["wrist_image"].shape == (256, 256, 3)
    assert obs["state"].shape == (8,)
    assert "black bowl" in obs["task_description"]


@pytest.mark.slow
def test_quickstart_end_to_end():
    actions = main(QuickstartConfig(checkpoint="random:tiny"))
    actions = np.asarray(actions)
    assert actions.shape == (8, 7)          # LIBERO chunk x action dim
    assert np.isfinite(actions).all()
    # unnormalized actions stay inside the (synthetic) dataset bounds
    assert np.abs(actions).max() <= 5.0
