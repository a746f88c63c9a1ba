"""prefetch_to_device: ordering, completeness, bool bit-pack round-trip."""

import numpy as np
import pytest

from sam3_lora_tpu.train.prefetch import prefetch_to_device


def _batches(n, seed=0):
    rng = np.random.RandomState(seed)
    out = []
    for i in range(n):
        out.append(
            {
                "images": rng.randint(0, 256, (2, 3, 16, 16)).astype(np.uint8),
                "masks": rng.rand(2, 5, 40, 40) > 0.5,  # big bool -> packed
                "valid": np.array([True, False]),  # tiny bool -> not packed
                "boxes": rng.rand(2, 5, 4).astype(np.float32),
                "idx": np.int32(i),
            }
        )
    return out


@pytest.mark.parametrize("size", [1, 2, 3])
@pytest.mark.parametrize("pack", [False, True])
def test_roundtrip_order_and_values(size, pack):
    src = _batches(5)
    got = list(prefetch_to_device(iter(src), size=size, pack_bool=pack))
    assert len(got) == len(src)
    for b_in, b_out in zip(src, got):
        assert set(b_out) == set(b_in)
        for k in b_in:
            np.testing.assert_array_equal(np.asarray(b_out[k]), b_in[k])
            assert np.asarray(b_out[k]).dtype == b_in[k].dtype


def test_packing_shrinks_wire_bytes():
    from sam3_lora_tpu.train.prefetch import _pack_leaves

    (b,) = _batches(1)
    leaves, shapes, _ = _pack_leaves(b)
    # exactly the one large bool leaf packs, 8x smaller
    packed = [s for s in shapes if s is not None]
    assert packed == [(2, 5, 40, 40)]
    total = sum(x.nbytes for x in leaves)
    raw = sum(v.nbytes for v in b.values())
    assert total <= raw - b["masks"].nbytes + b["masks"].nbytes // 8 + 8


def test_empty_and_short_iterators():
    assert list(prefetch_to_device(iter([]), size=2)) == []
    src = _batches(1)
    got = list(prefetch_to_device(iter(src), size=3, pack_bool=True))
    assert len(got) == 1
    np.testing.assert_array_equal(np.asarray(got[0]["masks"]), src[0]["masks"])


def test_bad_size():
    with pytest.raises(ValueError):
        list(prefetch_to_device(iter([]), size=0))


@pytest.mark.parametrize("pack", [False, True])
def test_sharded_prefetch_roundtrip(pack):
    """Batch-sharded prefetch on the 8-device CPU mesh: exact values, batch
    axis split over the data axis, scalar leaves replicated (the multi-chip
    real-data input path, SURVEY hard-part #4)."""
    import jax

    from sam3_lora_tpu.parallel import batch_sharding, make_mesh

    mesh = make_mesh()  # all 8 virtual devices on the data axis
    sharding = batch_sharding(mesh)
    rng = np.random.RandomState(0)
    src = [
        {
            "images": rng.randint(0, 256, (8, 3, 16, 16)).astype(np.uint8),
            "masks": rng.rand(8, 5, 40, 40) > 0.5,  # big bool -> packed
            "valid": np.array([True] * 8),
            "boxes": rng.rand(8, 5, 4).astype(np.float32),
            "idx": np.int32(i),  # scalar -> replicated
        }
        for i in range(4)
    ]
    got = list(
        prefetch_to_device(iter(src), size=2, sharding=sharding, pack_bool=pack)
    )
    assert len(got) == len(src)
    for b_in, b_out in zip(src, got):
        for k in b_in:
            np.testing.assert_array_equal(np.asarray(b_out[k]), b_in[k])
            assert np.asarray(b_out[k]).dtype == b_in[k].dtype
        # the batch leaves are really split: one shard per device, 1/8 rows
        shards = b_out["masks"].addressable_shards
        assert len(shards) == len(mesh.devices.ravel())
        assert shards[0].data.shape[0] == 1
        assert b_out["images"].addressable_shards[0].data.shape[0] == 1
