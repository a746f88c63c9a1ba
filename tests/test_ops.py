import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sam3_lora_tpu.ops import boxes as B
from sam3_lora_tpu.ops import masks as M
from sam3_lora_tpu.ops import rle as R
from sam3_lora_tpu.ops import posenc as P
from sam3_lora_tpu.ops import rope as RO
from sam3_lora_tpu.ops import windows as W
from sam3_lora_tpu.ops import attention as A
from sam3_lora_tpu.ops import sampling as S
from sam3_lora_tpu.ops import nms as N
from sam3_lora_tpu.ops import focal as F
from sam3_lora_tpu.ops import interpolate as I

rng = np.random.RandomState(0)


def rand_boxes_xyxy(n):
    xy = rng.rand(n, 2) * 0.6
    wh = rng.rand(n, 2) * 0.35 + 0.02
    return np.concatenate([xy, xy + wh], -1).astype(np.float32)


class TestBoxes:
    def test_conversions_roundtrip(self):
        b = rand_boxes_xyxy(17)
        cxcywh = B.box_xyxy_to_cxcywh(jnp.array(b))
        back = B.box_cxcywh_to_xyxy(cxcywh)
        np.testing.assert_allclose(back, b, atol=1e-6)

    def test_iou_props(self):
        b = jnp.array(rand_boxes_xyxy(9))
        iou, _ = B.box_iou(b, b)
        np.testing.assert_allclose(np.diag(np.array(iou)), 1.0, atol=1e-5)
        giou = B.generalized_box_iou(b, b)
        assert np.all(np.array(giou) <= np.array(iou) + 1e-6)
        np.testing.assert_allclose(
            np.diag(np.array(B.fast_diag_box_iou(b, b))[None]), 1.0, atol=1e-5
        )

    def test_iou_hand_case(self):
        a = jnp.array([[0.0, 0.0, 2.0, 2.0]])
        c = jnp.array([[1.0, 1.0, 3.0, 3.0]])
        iou, _ = B.box_iou(a, c)
        np.testing.assert_allclose(np.array(iou), [[1.0 / 7.0]], atol=1e-6)
        giou = B.generalized_box_iou(a, c)
        # enclosing box area 9, union 7 -> giou = 1/7 - 2/9
        np.testing.assert_allclose(np.array(giou), [[1 / 7 - 2 / 9]], atol=1e-6)

    def test_diag_matches_pairwise(self):
        b1 = jnp.array(rand_boxes_xyxy(11))
        b2 = jnp.array(rand_boxes_xyxy(11))
        d = B.fast_diag_generalized_box_iou(b1, b2)
        full = B.generalized_box_iou(b1, b2)
        np.testing.assert_allclose(np.array(d), np.diag(np.array(full)), atol=1e-5)

    def test_inverse_sigmoid(self):
        x = jnp.array([0.001, 0.25, 0.5, 0.9, 0.9999])
        y = B.inverse_sigmoid(x)
        np.testing.assert_allclose(
            jax.nn.sigmoid(y)[1:3], x[1:3], atol=1e-5
        )


class TestMasks:
    def test_mask_iou_brute(self):
        m1 = rng.rand(5, 12, 13) > 0.6
        m2 = rng.rand(4, 12, 13) > 0.4
        got = np.array(M.mask_iou(jnp.array(m1), jnp.array(m2)))
        for i in range(5):
            for j in range(4):
                inter = (m1[i] & m2[j]).sum()
                union = (m1[i] | m2[j]).sum()
                want = inter / max(union, 1)
                np.testing.assert_allclose(got[i, j], want, atol=1e-5)

    def test_masks_to_boxes(self):
        m = np.zeros((2, 10, 11), bool)
        m[0, 2:5, 3:9] = True
        got = np.array(M.masks_to_boxes(jnp.array(m)))
        np.testing.assert_allclose(got[0], [3, 2, 9, 5])
        np.testing.assert_allclose(got[1], [0, 0, 0, 0])


class TestRLE:
    def test_roundtrip(self):
        for _ in range(5):
            m = (rng.rand(23, 17) > 0.5).astype(np.uint8)
            rle = R.rle_encode(m)
            back = R.rle_decode(rle)
            np.testing.assert_array_equal(back, m)
            assert R.rle_area(rle) == m.sum()

    def test_empty_and_full(self):
        for m in [np.zeros((7, 5), np.uint8), np.ones((7, 5), np.uint8)]:
            np.testing.assert_array_equal(R.rle_decode(R.rle_encode(m)), m)

    def test_polygon(self):
        mask = R.polygons_to_mask([[2, 2, 8, 2, 8, 8, 2, 8]], 12, 12)
        assert mask[5, 5] == 1 and mask[0, 0] == 0
        assert mask.sum() >= 36  # at least the 6x6 interior


class TestPosEnc:
    def test_sine_grid_matches_reference_formula(self):
        """Re-derive the reference PositionEmbeddingSine math directly."""
        h, w, npf = 5, 7, 16
        got = np.array(P.sine_pos_grid(h, w, num_pos_feats=2 * npf))
        y_embed = np.arange(1, h + 1, dtype=np.float64)
        x_embed = np.arange(1, w + 1, dtype=np.float64)
        y_embed = y_embed / (h + 1e-6) * (2 * np.pi)
        x_embed = x_embed / (w + 1e-6) * (2 * np.pi)
        dim_t = 10000.0 ** (2 * (np.arange(npf) // 2) / npf)
        for yi in range(h):
            py = y_embed[yi] / dim_t
            ref_y = np.stack([np.sin(py[0::2]), np.cos(py[1::2])], -1).reshape(-1)
            np.testing.assert_allclose(got[:npf, yi, 0], ref_y, atol=1e-4)
        for xi in range(w):
            px = x_embed[xi] / dim_t
            ref_x = np.stack([np.sin(px[0::2]), np.cos(px[1::2])], -1).reshape(-1)
            np.testing.assert_allclose(got[npf:, 0, xi], ref_x, atol=1e-4)

    def test_gen_sineembed_shapes_and_order(self):
        pos = jnp.array(rng.rand(3, 4, 4).astype(np.float32))
        out = P.gen_sineembed_for_position(pos, 256)
        assert out.shape == (3, 4, 512)
        # y embedding occupies the first 128 channels
        pos2 = pos.at[..., 0].set(0.123)
        out2 = P.gen_sineembed_for_position(pos2, 256)
        assert np.allclose(np.array(out[..., :128]), np.array(out2[..., :128]))
        assert not np.allclose(np.array(out[..., 128:256]), np.array(out2[..., 128:256]))

    def test_encode_boxes_layout(self):
        cx = jnp.array([0.3])
        cy = jnp.array([0.7])
        w = jnp.array([0.2])
        h = jnp.array([0.4])
        e = np.array(P.encode_boxes(cx, cy, w, h, 8))
        assert e.shape == (1, 10)
        np.testing.assert_allclose(e[0, -2:], [0.4, 0.2], atol=1e-6)


class TestRope:
    def test_matches_complex_multiply(self):
        dim, ex, ey = 16, 3, 4
        angles = RO.compute_axial_freqs(dim, ex, ey, scale_pos=0.5)
        cos, sin = RO.rope_cos_sin(angles)
        x = rng.randn(2, ex * ey, dim).astype(np.float32)
        got = np.array(RO.apply_rope(jnp.array(x), cos, sin))
        # complex reference
        xc = x.reshape(2, ex * ey, dim // 2, 2)
        xc = xc[..., 0] + 1j * xc[..., 1]
        fc = np.exp(1j * angles)
        out = xc * fc[None]
        want = np.stack([out.real, out.imag], -1).reshape(x.shape)
        np.testing.assert_allclose(got, want.astype(np.float32), atol=1e-5)

    def test_t_xy_layout(self):
        # token index t: t_x = t % end_x (fast axis), t_y = t // end_x
        a = RO.compute_axial_freqs(8, end_x=3, end_y=2)
        assert a.shape == (6, 4)
        # x angles repeat with period end_x, y angles constant within a row
        np.testing.assert_allclose(a[0, :2], a[3, :2])
        np.testing.assert_allclose(a[0, 2:], a[1, 2:])

    def test_half_layout_scores_invariant(self):
        """rotate-half on weight-permuted q/k must give the SAME attention
        scores as interleaved rope on the original q/k (the ViT hot path,
        models/vit.py): S = rope(q) rope(k)^T is invariant to the shared
        channel permutation rope_half_perm."""
        dim, ex, ey = 16, 3, 4
        L = ex * ey
        angles = RO.compute_axial_freqs(dim, ex, ey)
        cos, sin = RO.rope_cos_sin(angles)
        q = rng.randn(2, L, dim).astype(np.float32)
        k = rng.randn(2, L, dim).astype(np.float32)
        perm = RO.rope_half_perm(dim)
        s_ref = np.einsum(
            "bld,bmd->blm",
            np.array(RO.apply_rope(jnp.array(q), cos, sin)),
            np.array(RO.apply_rope(jnp.array(k), cos, sin)),
        )
        s_half = np.einsum(
            "bld,bmd->blm",
            np.array(RO.apply_rope_half(jnp.array(q[..., perm]), cos, sin)),
            np.array(RO.apply_rope_half(jnp.array(k[..., perm]), cos, sin)),
        )
        np.testing.assert_allclose(s_half, s_ref, atol=1e-5)

    def test_half_is_permuted_interleaved(self):
        # elementwise: rope_half(x[perm]) == rope(x)[perm]
        dim = 8
        angles = RO.compute_axial_freqs(dim, end_x=2, end_y=2)
        cos, sin = RO.rope_cos_sin(angles)
        x = rng.randn(3, 4, dim).astype(np.float32)
        perm = RO.rope_half_perm(dim)
        want = np.array(RO.apply_rope(jnp.array(x), cos, sin))[..., perm]
        got = np.array(RO.apply_rope_half(jnp.array(x[..., perm]), cos, sin))
        np.testing.assert_allclose(got, want, atol=1e-6)


class TestWindows:
    def test_roundtrip(self):
        x = jnp.array(rng.randn(2, 6, 6, 5).astype(np.float32))
        win, pad_hw = W.window_partition(x, 3)
        assert win.shape == (2 * 4, 3, 3, 5)
        back = W.window_unpartition(win, 3, pad_hw, (6, 6))
        np.testing.assert_allclose(np.array(back), np.array(x))

    def test_roundtrip_with_padding(self):
        x = jnp.array(rng.randn(1, 5, 7, 2).astype(np.float32))
        win, pad_hw = W.window_partition(x, 3)
        assert pad_hw == (6, 9)
        back = W.window_unpartition(win, 3, pad_hw, (5, 7))
        np.testing.assert_allclose(np.array(back), np.array(x))


class TestAttention:
    def test_vs_torch_sdpa(self):
        import torch

        b, h, lq, lk, d = 2, 3, 5, 7, 8
        q = rng.randn(b, h, lq, d).astype(np.float32)
        k = rng.randn(b, h, lk, d).astype(np.float32)
        v = rng.randn(b, h, lk, d).astype(np.float32)
        bias = rng.randn(b, h, lq, lk).astype(np.float32)
        pad = rng.rand(b, lk) > 0.7
        pad[:, 0] = False  # keep at least one key
        got = np.array(
            A.dot_product_attention(
                jnp.array(q), jnp.array(k), jnp.array(v),
                bias=jnp.array(bias), key_padding_mask=jnp.array(pad),
            )
        )
        tmask = torch.from_numpy(bias).clone()
        tmask = tmask + torch.where(
            torch.from_numpy(pad)[:, None, None, :], -1e9, 0.0
        )
        want = torch.nn.functional.scaled_dot_product_attention(
            torch.from_numpy(q), torch.from_numpy(k), torch.from_numpy(v),
            attn_mask=tmask,
        ).numpy()
        np.testing.assert_allclose(got, want, atol=1e-5)


class TestSampling:
    def test_grid_sample_vs_torch(self):
        import torch

        img = rng.randn(2, 3, 9, 11).astype(np.float32)
        grid = (rng.rand(2, 4, 5, 2).astype(np.float32) * 2.2) - 1.1
        got = np.array(S.grid_sample(jnp.array(img), jnp.array(grid)))
        want = torch.nn.functional.grid_sample(
            torch.from_numpy(img), torch.from_numpy(grid),
            mode="bilinear", padding_mode="zeros", align_corners=False,
        ).numpy()
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_roi_align_linear_field(self):
        # bilinear sampling of a linear field is exact -> ROI mean per bin.
        # torchvision default semantics (aligned=False): no half-pixel shift.
        h, w = 16, 16
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        img = np.stack([xx, yy])[None]  # (1, 2, H, W)
        boxes = jnp.array([[[2.0, 3.0, 9.0, 13.0]]])
        out = np.array(S.roi_align(jnp.array(img), boxes, output_size=7))
        centers = 2.0 + (np.arange(7) + 0.5) / 7 * 7.0
        np.testing.assert_allclose(out[0, 0, 0, 3, :], centers, atol=1e-4)
        # aligned=True keeps the old continuous half-pixel convention
        out_a = np.array(
            S.roi_align(jnp.array(img), boxes, output_size=7, aligned=True)
        )
        np.testing.assert_allclose(
            out_a[0, 0, 0, 3, :], centers - 0.5, atol=1e-4
        )


class TestNMS:
    def test_vs_bruteforce(self):
        n = 30
        masks = rng.rand(n, 16, 16) > 0.65
        scores = rng.rand(n).astype(np.float32)
        thr = 0.3
        keep = np.array(N.nms_masks(jnp.array(masks), jnp.array(scores), thr))
        # brute force greedy
        order = np.argsort(-scores)
        iou = np.zeros((n, n))
        for i in range(n):
            for j in range(n):
                inter = (masks[i] & masks[j]).sum()
                union = (masks[i] | masks[j]).sum()
                iou[i, j] = inter / max(union, 1)
        alive = np.ones(n, bool)
        for ii, i in enumerate(order):
            if not alive[i]:
                continue
            for j in order[ii + 1 :]:
                if alive[j] and iou[i, j] > thr:
                    alive[j] = False
        np.testing.assert_array_equal(keep, alive)


class TestFocal:
    def test_vs_torch_formula(self):
        import torch

        logits = rng.randn(6, 10).astype(np.float32)
        targets = (rng.rand(6, 10) > 0.5).astype(np.float32)
        got = np.array(F.sigmoid_focal_loss(jnp.array(logits), jnp.array(targets)))
        tl = torch.from_numpy(logits)
        tt = torch.from_numpy(targets)
        prob = tl.sigmoid()
        ce = torch.nn.functional.binary_cross_entropy_with_logits(
            tl, tt, reduction="none"
        )
        p_t = prob * tt + (1 - prob) * (1 - tt)
        want = ce * (1 - p_t) ** 2.0
        alpha_t = 0.25 * tt + 0.75 * (1 - tt)
        want = (alpha_t * want).numpy()
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_dice_simple(self):
        logits = jnp.full((2, 4), 100.0)  # sigmoid ~ 1
        targets = jnp.array([[1.0, 1, 1, 1], [0, 0, 0, 0]])
        loss = np.array(F.dice_loss(logits, targets, num_boxes=2.0))
        # row0: 1 - (8+1)/(8+1) = 0 ; row1: 1 - 1/5
        np.testing.assert_allclose(loss, (0.0 + 0.8) / 2.0, atol=1e-4)


class TestInterpolate:
    def test_bilinear_vs_torch(self):
        import torch

        x = rng.randn(2, 3, 7, 9).astype(np.float32)
        got = np.array(I.resize_bilinear(jnp.array(x), (13, 5)))
        want = torch.nn.functional.interpolate(
            torch.from_numpy(x), size=(13, 5), mode="bilinear", align_corners=False
        ).numpy()
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_nearest_vs_torch(self):
        import torch

        x = rng.randn(1, 2, 5, 6).astype(np.float32)
        got = np.array(I.resize_nearest(jnp.array(x), (11, 9)))
        want = torch.nn.functional.interpolate(
            torch.from_numpy(x), size=(11, 9), mode="nearest"
        ).numpy()
        np.testing.assert_array_equal(got, want)


class TestSeparableBiasAttention:
    """ops/rpb_attention.py vs the dense boxRPB formulation."""

    def _inputs(self, b=2, h=3, lq=7, gh=6, gw=4, dh=8):
        k0 = jax.random.PRNGKey(3)
        ks = jax.random.split(k0, 5)
        q = jax.random.normal(ks[0], (b, h, lq, dh), jnp.float32)
        k = jax.random.normal(ks[1], (b, h, gh * gw, dh), jnp.float32)
        v = jax.random.normal(ks[2], (b, h, gh * gw, dh), jnp.float32)
        dy = jax.random.normal(ks[3], (b, lq, gh, h), jnp.float32)
        dx = jax.random.normal(ks[4], (b, lq, gw, h), jnp.float32)
        return q, k, v, dy, dx, (gh, gw)

    def _dense(self, q, k, v, dy, dx, grid_hw):
        from sam3_lora_tpu.models.decoder import rpb_dense_bias

        dh = q.shape[-1]
        bias = rpb_dense_bias(dy, dx)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) * (dh ** -0.5) + bias
        probs = jax.nn.softmax(logits, axis=-1)
        return jnp.einsum("bhqk,bhkd->bhqd", probs, v)

    def test_matches_dense(self):
        from sam3_lora_tpu.ops.rpb_attention import separable_bias_attention

        q, k, v, dy, dx, hw = self._inputs()
        got = separable_bias_attention(q, k, v, dy, dx, grid_hw=hw)
        want = self._dense(q, k, v, dy, dx, hw)
        np.testing.assert_allclose(np.array(got), np.array(want), atol=2e-5)

    def test_grads_match_dense(self):
        from sam3_lora_tpu.ops.rpb_attention import separable_bias_attention

        args = self._inputs()
        q, k, v, dy, dx, hw = args

        def ls(f):
            return lambda *a: (f(*a, hw) * jnp.arange(a[0].shape[-1])).sum()

        def sep(q, k, v, dy, dx, hw):
            return separable_bias_attention(q, k, v, dy, dx, grid_hw=hw)

        g1 = jax.grad(ls(sep), argnums=(0, 1, 2, 3, 4))(q, k, v, dy, dx)
        g2 = jax.grad(ls(self._dense), argnums=(0, 1, 2, 3, 4))(q, k, v, dy, dx)
        for a, b_ in zip(g1, g2):
            np.testing.assert_allclose(np.array(a), np.array(b_), atol=5e-5)

    def test_dropout_expectation_and_determinism(self):
        from sam3_lora_tpu.ops.rpb_attention import separable_bias_attention

        q, k, v, dy, dx, hw = self._inputs()
        key = jax.random.PRNGKey(7)
        o1 = separable_bias_attention(
            q, k, v, dy, dx, grid_hw=hw, dropout=0.5, dropout_key=key
        )
        o2 = separable_bias_attention(
            q, k, v, dy, dx, grid_hw=hw, dropout=0.5, dropout_key=key
        )
        np.testing.assert_array_equal(np.array(o1), np.array(o2))
        # expectation over many keys approaches the undropped output
        outs = [
            separable_bias_attention(
                q, k, v, dy, dx, grid_hw=hw, dropout=0.5,
                dropout_key=jax.random.PRNGKey(100 + i),
            )
            for i in range(64)
        ]
        mean = np.mean([np.array(o) for o in outs], axis=0)
        want = np.array(separable_bias_attention(q, k, v, dy, dx, grid_hw=hw))
        assert np.abs(mean - want).mean() < 0.05


class TestDecoderSeparableBiasPath:
    def test_decoder_flag_equivalence(self):
        """TransformerDecoder output identical with dense vs separable bias
        (tiny config has dec_dropout=0, so the paths are exactly comparable)."""
        import dataclasses

        from sam3_lora_tpu.config import tiny_model_config
        from sam3_lora_tpu.models.decoder import TransformerDecoder
        from sam3_lora_tpu.models.layers import Spec

        outs = []
        for sep in (False, True):
            cfg = dataclasses.replace(
                tiny_model_config(), dec_separable_bias=sep, dtype="float32"
            )
            sp = Spec(cfg)
            dec = TransformerDecoder(sp)
            b, hw, s, d = 2, 6 * 4, 5, cfg.d_model
            k0 = jax.random.PRNGKey(11)
            ks = jax.random.split(k0, 4)
            mem = jax.random.normal(ks[0], (b, hw, d), jnp.float32)
            mpos = jax.random.normal(ks[1], (b, hw, d), jnp.float32)
            mtext = jax.random.normal(ks[2], (b, s, d), jnp.float32)
            params = dec.init(
                {"params": ks[3]}, mem, mpos, mtext, None, (6, 4), train=True
            )
            out = dec.apply(
                params, mem, mpos, mtext, None, (6, 4), apply_dac=True, train=True
            )
            outs.append(out)
        np.testing.assert_allclose(
            np.array(outs[0].hs), np.array(outs[1].hs), atol=2e-5
        )
        np.testing.assert_allclose(
            np.array(outs[0].pred_coords), np.array(outs[1].pred_coords), atol=2e-5
        )
