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
# Fast-tier curation, structural form (VERDICT r4 next-#4): the "-m 'not
# slow'" tier must stay a <300 s signal on the 1-core build host, and
# hand-curated nodeid lists lose the race against test growth (three rounds
# running). The tier is now driven by a COMMITTED duration database
# (tests/test_durations.json, recorded with `pytest --record-durations` on an
# idle host): a test is fast only if its recorded setup+call+teardown fits
# _FAST_TEST_BUDGET_S and its module's one-time fixture cost (max setup seen
# in the module) fits _MODULE_SETUP_BUDGET_S. Tests with NO record — i.e.
# every newly added test — are SLOW BY DEFAULT until the database is
# re-recorded, so the tier can only shrink between recordings, never silently
# regrow. Explicit @pytest.mark.slow still wins; the legacy hand lists below
# remain only as a fallback when the database file is absent.
import json as _json

_DUR_DB_PATH = os.path.join(os.path.dirname(__file__), "test_durations.json")
_FAST_TEST_BUDGET_S = 3.0
_MODULE_SETUP_BUDGET_S = 10.0


def _load_duration_db():
    try:
        with open(_DUR_DB_PATH) as f:
            return _json.load(f)
    except (OSError, ValueError):
        return None


def pytest_addoption(parser):
    parser.addoption(
        "--record-durations", action="store_true", default=False,
        help="record per-test durations + per-module fixture cost into "
             "tests/test_durations.json (run on the FULL suite, idle host)",
    )


def pytest_configure(config):
    if config.getoption("--record-durations"):
        config._duration_record = {"tests": {}, "module_setup": {}}
        config.pluginmanager.register(_DurationRecorder(config))


class _DurationRecorder:
    def __init__(self, config):
        self.config = config

    def pytest_runtest_logreport(self, report):
        rec = self.config._duration_record
        rel = report.nodeid.split("tests/")[-1]
        mod = rel.split("::")[0]
        rec["tests"][rel] = rec["tests"].get(rel, 0.0) + report.duration
        if report.when == "setup":
            ms = rec["module_setup"]
            ms[mod] = max(ms.get(mod, 0.0), report.duration)

    def pytest_sessionfinish(self, session, exitstatus):
        rec = self.config._duration_record
        db = _load_duration_db() or {"tests": {}, "module_setup": {}}
        # merge: entries measured this run overwrite, others survive, so a
        # partial re-record (one module) composes with the committed db
        db["tests"].update({k: round(v, 3) for k, v in rec["tests"].items()})
        db["module_setup"].update(
            {k: round(v, 3) for k, v in rec["module_setup"].items()}
        )
        with open(_DUR_DB_PATH, "w") as f:
            _json.dump(
                {
                    "tests": dict(sorted(db["tests"].items())),
                    "module_setup": dict(sorted(db["module_setup"].items())),
                },
                f, indent=0, sort_keys=False,
            )
        print(f"\n[durations] wrote {len(rec['tests'])} records -> {_DUR_DB_PATH}")


# Legacy fallback lists (used only when tests/test_durations.json is absent).
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

    if config.getoption("--record-durations"):
        return  # recording runs measure everything; no tier marking
    db = _load_duration_db()
    for item in items:
        rel = item.nodeid.split("tests/")[-1]
        mod = rel.split("::")[0]
        if db is not None:
            t = db["tests"].get(rel)
            slow = (
                t is None  # new/renamed test: slow until re-recorded
                or t > _FAST_TEST_BUDGET_S
                or db["module_setup"].get(mod, 0.0) > _MODULE_SETUP_BUDGET_S
            )
        else:
            slow = rel in _SLOW_ON_THIS_HOST or mod in _SLOW_MODULES
        if slow:
            item.add_marker(_pytest.mark.slow)
