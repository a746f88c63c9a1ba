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
# the 1-core build host (VERDICT r2 weak #5). File-level @pytest.mark.slow
# covers the full-model parity/integration files; the entries below are the
# residual heavyweights measured at >=14 s each in the 2026-08-19 timed run
# (full non-slow suite was 1038 s; these sum to ~620 s).
_SLOW_ON_THIS_HOST = {
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
