import os

# Force CPU with 8 virtual devices so multi-chip sharding logic is exercised
# without TPU hardware (must run before jax import). The outer environment
# pins JAX_PLATFORMS to the TPU tunnel, so this must be a hard override.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# The axon TPU-tunnel plugin (sitecustomize) force-sets jax_platforms="axon,cpu"
# via jax.config at interpreter boot, so the env var alone is not enough — every
# op would cross the network tunnel. Override via config before any backend
# initializes.
jax.config.update("jax_platforms", "cpu")

# Parity tests compare against torch fp32; keep matmuls exact.
jax.config.update("jax_default_matmul_precision", "highest")


# ---------------------------------------------------------------------------
# Fast-tier curation: the "-m 'not slow'" tier must stay a <5-min signal on
# the 1-core build host (VERDICT r2 weak #5, r3 weak #3). File-level
# @pytest.mark.slow covers the full-model parity/integration files; the
# entries below are the residual heavyweights from two timed runs on the
# 1-core host (2026-08-19: 1038 s total; 2026-08-20 re-time after the first
# tranche: 523 s). Parametrized kernel-parity tests keep at least one cheap
# variant in the fast tier; every marked test still runs in the full suite.
_SLOW_ON_THIS_HOST = {
    # third tranche (2026-08-20 --durations=60 re-time: fast tier measured
    # 336.73/353.25 s after the second tranche; target <300 s with margin).
    # test_interactive's remaining fast test carried the 40 s module fixture
    # alone (53 s total) — interactive coverage now lives in the full tier
    # only, alongside the other integration modules in _SLOW_MODULES.
    "test_interactive.py::test_interactive_ground_one_call",
    "test_ops.py::TestSeparableBiasAttention::test_grads_match_dense",
    "test_io_video_predictor.py::TestVideoPredictorSessions::test_session_lifecycle",
    "test_processor.py::test_set_image_caches_backbone",
    # long-attention kernel parity (new in r4): keep the cheap f32 p4-d32
    # variant + dispatch tests fast, mark the heavy bf16/p2-d64 combos
    "test_long_attention.py::test_long_kernel_fwd_and_grads_match_xla[bfloat16-0.03-p4-d32]",
    "test_long_attention.py::test_long_kernel_fwd_and_grads_match_xla[float32-2e-05-p2-d64]",
    "test_long_attention.py::test_long_kernel_fwd_and_grads_match_xla[bfloat16-0.03-p2-d64]",
    "test_long_attention.py::test_long_rope_kernel_matches_unfused[bfloat16-0.03]",
    # second tranche (2026-08-20 --durations=25, fast tier was 523.55 s;
    # these sum to ~263 s -> predicted ~260 s tier)
    "test_video.py::TestTrackerPropagation::test_streaming_with_propagation",
    "test_quant.py::test_base_checkpoint_roundtrip_across_quant_configs",
    "test_data.py::TestMaskPromptPath::test_geometry_encoder_appends_mask_tokens",
    "test_ops.py::TestDecoderSeparableBiasPath::test_decoder_flag_equivalence",
    "test_interactive.py::test_session_runs_stages_and_grows_prompts",
    "test_window_attention.py::TestVitPackedNativeChain::test_packed_chain_matches_xla_reference",
    "test_ops.py::TestSeparableBiasAttention::test_matches_dense",
    "test_video_heuristics.py::TestOcclusionSuppression::test_retired_slot_marked_always_occluded",
    "test_model.py::TestLoRA::test_default_targets_match_vit_mlp_only",
    "test_window_attention.py::test_mxu_sum_variant_matches_oracle[packed-bfloat16-0.03]",
    "test_video.py::TestTrackStateMachine::test_spawn_track_retire_lifecycle",
    "test_window_attention.py::test_window_rope_kernel_matches_unfused[grouped-float32-2e-05]",
    "test_model.py::TestLoRA::test_zero_init_forward_parity",
    "test_video_losses.py::TestPointSampling::test_uncertain_points_concentrate_at_boundary",
    "test_quant.py::test_lora_linear_base_quant_gating_and_adapter_grads",
    "test_logging.py::test_tensorboard_logger_writes",
    "test_window_attention.py::test_window_rope_kernel_matches_unfused[grouped-bfloat16-0.03]",
    "test_model.py::TestForward::test_deterministic_eval",
    "test_window_attention.py::test_mxu_sum_variant_matches_oracle[grouped-bfloat16-0.03]",
    "test_window_attention.py::test_mxu_sum_variant_matches_oracle[packed-float32-2e-05]",
    # first tranche (2026-08-19, >=14 s each)
    "test_quant.py::test_trainer_fit_with_prequantized_base",
    "test_model.py::TestLoRA::test_masked_optimizer_updates_only_lora",
    "test_processor.py::test_int8_processor_prequantizes_and_matches_dynamic",
    "test_remat_policies.py::test_remat_policies_numerically_identical",
    "test_remat_policies.py::test_encoder_ffn_remat_numerically_identical",
    "test_model.py::TestForward::test_eval_shapes",
    "test_model.py::TestForward::test_train_shapes_dac_and_matching",
    "test_matcher.py::TestHungarian::test_optimal_cost_vs_scipy_random",
    "test_video_heuristics.py::TestSlotSharding::test_associate_and_update_with_sharded_slots",
    "test_data.py::TestMaskPromptPath::test_processor_mask_prompt_wiring",
    "test_ops.py::TestSeparableBiasAttention::test_dropout_expectation_and_determinism",
    "test_video.py::TestTrackerPropagation::test_memory_ring_eviction",
}
# whole modules whose (module-scoped) fixtures alone cost 20-40 s
_SLOW_MODULES = {"test_agent_tools.py", "test_predictor.py", "test_tracking_predictor.py"}


def pytest_collection_modifyitems(config, items):
    import pytest as _pytest

    for item in items:
        rel = item.nodeid.split("tests/")[-1]
        mod = rel.split("::")[0]
        if rel in _SLOW_ON_THIS_HOST or mod in _SLOW_MODULES:
            item.add_marker(_pytest.mark.slow)
