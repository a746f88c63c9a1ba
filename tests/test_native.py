"""Native C++ RLE codec vs the pure-numpy oracle (byte-identical round trips).

The numpy implementation in ops/rle.py was itself validated against
pycocotools' format (tests/test_ops.py RLE cases); here the C++ library must
match it bit-for-bit on random, adversarial, and empty masks.
"""

import numpy as np
import pytest

from sam3_lora_tpu import native
from sam3_lora_tpu.ops.rle import (
    rle_decode_numpy,
    rle_encode_numpy,
)

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


def masks():
    rng = np.random.RandomState(0)
    out = [
        np.zeros((7, 5), np.uint8),                    # all zeros
        np.ones((7, 5), np.uint8),                     # all ones (leading 0 run)
        (rng.rand(33, 17) > 0.5).astype(np.uint8),     # dense noise
        (rng.rand(64, 64) > 0.95).astype(np.uint8),    # sparse
        np.eye(32, dtype=np.uint8),                    # diagonal (many runs)
    ]
    m = np.zeros((50, 40), np.uint8)
    m[10:30, 5:35] = 1                                  # rectangle
    out.append(m)
    big = (rng.rand(1008, 1008) > 0.7).astype(np.uint8)  # long runs > varint char
    out.append(big)
    return out


@pytest.mark.parametrize("idx", range(7))
def test_encode_matches_numpy(idx):
    m = masks()[idx]
    assert native.rle_encode(m) == rle_encode_numpy(m)


@pytest.mark.parametrize("idx", range(7))
def test_decode_round_trip(idx):
    m = masks()[idx]
    rle = native.rle_encode(m)
    np.testing.assert_array_equal(native.rle_decode(rle), m)
    # and cross-path: numpy-encoded -> native-decoded
    np.testing.assert_array_equal(native.rle_decode(rle_encode_numpy(m)), m)
    # native-encoded -> numpy-decoded
    np.testing.assert_array_equal(rle_decode_numpy(rle), m)


def test_uncompressed_counts_list():
    m = masks()[5]
    rle = rle_encode_numpy(m)
    from sam3_lora_tpu.ops.rle import _string_to_counts

    raw = {"size": rle["size"], "counts": _string_to_counts(rle["counts"]).tolist()}
    np.testing.assert_array_equal(native.rle_decode(raw), m)


def test_downsample_exact_matches_numpy():
    rng = np.random.RandomState(1)
    m = (rng.rand(64, 64) > 0.6).astype(np.float32)
    out = native.downsample_mask_exact(m, 16)
    ref = (m.reshape(16, 4, 16, 4).mean(axis=(1, 3)) > 0.5).astype(np.float32)
    np.testing.assert_array_equal(out, ref)


def test_downsample_non_exact_returns_none():
    assert native.downsample_mask_exact(np.zeros((30, 30), np.float32), 7) is None


def test_dispatch_through_ops_rle():
    """ops.rle.rle_encode/decode route through the native codec and stay
    byte-identical to the numpy oracle."""
    from sam3_lora_tpu.ops.rle import rle_decode, rle_encode

    m = masks()[2]
    rle = rle_encode(m)
    assert rle == rle_encode_numpy(m)
    np.testing.assert_array_equal(rle_decode(rle), m)
