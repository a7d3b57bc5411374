"""Native C++ data-ops parity vs the NumPy reference implementations."""

import numpy as np
import pytest

from openvla_oft_tpu.processing.action_tokenizer import ActionTokenizer
from openvla_oft_tpu.utils import native


@pytest.fixture(scope="module")
def lib_ok():
    if not native.available():
        pytest.skip("g++ not available; numpy fallback covered elsewhere")
    return True


def test_pad_stack_parity(lib_ok, rng):
    seqs = [rng.integers(0, 100, n).astype(np.int32) for n in (3, 7, 5)]
    out = native.pad_stack(seqs, target=8, fill=-1)
    assert out.shape == (3, 8)
    for i, s in enumerate(seqs):
        np.testing.assert_array_equal(out[i, :len(s)], s)
        assert (out[i, len(s):] == -1).all()
    with pytest.raises(ValueError):
        native.pad_stack([np.arange(9, dtype=np.int32)], target=8, fill=0)


def test_attention_mask(lib_ok):
    out = native.attention_mask([2, 5], target=6)
    np.testing.assert_array_equal(out, [[1, 1, 0, 0, 0, 0],
                                        [1, 1, 1, 1, 1, 0]])


def test_encode_decode_parity_vs_numpy(lib_ok, rng):
    at = ActionTokenizer()
    actions = rng.uniform(-1.2, 1.2, (64, 7)).astype(np.float32)
    ref_ids = at.encode_to_token_ids(actions)
    got_ids = native.encode_actions(actions)
    # boundary float rounding may flip a rare bin by 1
    mismatch = (ref_ids != got_ids).mean()
    assert mismatch < 0.01, mismatch
    np.testing.assert_allclose(
        native.decode_actions(ref_ids.astype(np.int32)),
        at.decode_token_ids_to_actions(ref_ids), rtol=1e-5, atol=1e-6)


def test_normalize_image_parity(lib_ok, rng):
    img = (rng.random((16, 16, 3)) * 255).astype(np.uint8)
    mean, std = (0.485, 0.456, 0.406), (0.229, 0.224, 0.225)
    got = native.normalize_image(img, mean, std)
    ref = (img.astype(np.float32) / 255.0 - np.asarray(mean, np.float32)) \
        / np.asarray(std, np.float32)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)
