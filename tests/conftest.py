"""Test configuration: force a CPU backend with 8 virtual devices so
multi-device sharding tests run without TPU hardware (SURVEY.md §4), and so
Pallas kernels run in interpret mode deterministically.

The environment's sitecustomize registers a TPU PJRT plugin at interpreter
startup (before conftest runs), so env vars alone are not enough —
jax.config.update is required, and works as long as no backend has been
initialized yet.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

# Persistent compile cache for the CPU test jits: the fast gating tier
# (`-m "not slow"`) is compile-dominated on one core, so a warm
# `.jax_cache_tests/` is what makes it fit its ~3-minute budget. Cold
# bootstrap (first run, or after a JAX upgrade) recompiles everything —
# see ROADMAP "CI timing note".
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache_tests"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


# ── fast-tier budget (re-tier, round 4) ─────────────────────────────
# The fast gating tier (`-m "not slow"`) budgets ~3 min WARM on one
# core (see pytest.ini / ROADMAP "CI timing note"). These tests each
# took >=4s with a warm compile cache (measured 2026-08-19, warm-tier
# durations run); they are re-tiered to `slow` here, in one place, so
# the budget holds without scattering markers. Every subsystem keeps
# at least one sub-4s test in the fast tier.
_RETIERED_SLOW = {
    "test_aux_components.py::test_demo_model_tiny",
    "test_fuyu.py::test_fuyu_cached_decode_matches_full",
    "test_fuyu.py::test_fuyu_model_forward_and_merge",
    "test_int4_cache.py::test_int4_cached_decode_close_to_full_forward[mpt]",
    "test_int8_cache.py::test_idefics_int8_cached_decode",
    "test_int8_cache.py::test_int8_cached_decode_kernel_path",
    "test_megakernel.py::test_megakernel_matches_reference[2-8-128-256-0]",
    "test_megakernel.py::test_megakernel_matches_reference[3-4-128-256-57]",
    "test_megakernel.py::test_megakernel_matches_reference[8-4-128-512-511]",
    "test_megakernel.py::test_model_level_megakernel_decode_matches_int8_path",
    "test_models.py::test_otter_forward_and_media_masking",
    "test_models.py::test_perceiver_frame_mask_matches_unpadded",
    "test_models.py::test_perceiver_shapes",
    "test_native_preproc.py::test_batch_throughput_beats_pil",
    "test_presets.py::test_preset_traces_and_param_count[falcon7b]",
    "test_presets.py::test_preset_traces_and_param_count[llama2-chat-13b]",
    "test_presets.py::test_preset_traces_and_param_count[llama2-chat-7b]",
    "test_presets.py::test_preset_traces_and_param_count[mpt30b]",
    "test_presets.py::test_preset_traces_and_param_count[vicuna-33b]",
    "test_public_suite.py::test_two_process_eval_identical_global_score",
    "test_quant.py::test_fused_layer_tail_matches_unfused",
    "test_ring_attention.py::test_ring_kernel_local_block_matches_einsum",
    "test_scaling_shapes.py::test_partition_rules_divide_recipe_meshes[otter_llama2_chat13b-d1f1t2]",
    "test_scaling_shapes.py::test_partition_rules_divide_recipe_meshes[otter_llama2_chat13b-d1f8t1]",
    "test_scaling_shapes.py::test_partition_rules_divide_recipe_meshes[otter_vicuna33b-d1f16t1]",
    "test_scaling_shapes.py::test_partition_rules_divide_recipe_meshes[otter_vicuna33b-d1f8t4]",
    "test_seq_parallel.py::test_forward_matches_plain[mpt]",
    "test_seq_parallel.py::test_train_step_parity_sp_vs_plain",
    "test_serve.py::test_session_stream_fn_reuses_cache",
    "test_serve.py::test_spec_session_stream_fn_composes",
    "test_serve.py::test_spec_stream_fn_matches_engine",
    "test_session.py::test_session_multi_turn_matches_stateless[llama]",
    "test_session.py::test_session_multi_turn_matches_stateless[mpt]",
    "test_session.py::test_spec_session_divergent_history",
    "test_session.py::test_spec_session_eos_and_capacity",
    "test_session.py::test_spec_session_multi_turn_matches_stateless",
    "test_session.py::test_spec_session_sampled_t0_matches_greedy",
    "test_speculative.py::test_spec_sampling_near_zero_temperature_is_greedy",
    "test_speculative.py::test_speculative_eos_termination",
    "test_speculative.py::test_speculative_equals_target_greedy[1]",
    "test_speculative.py::test_speculative_equals_target_greedy[3]",
    "test_speculative.py::test_speculative_equals_target_greedy[4]",
    "test_speculative.py::test_speculative_self_draft_full_acceptance",
    "test_speculative.py::test_speculative_stream_matches_engine_stream",
    "test_train.py::test_frozen_int8_grad_parity",
    "test_train.py::test_fused_ce_matches_standard",
    "test_train.py::test_int8_adam_matches_f32_adam_updates",
    "test_train.py::test_int8_adam_training_trajectory",
    "test_train.py::test_remat_matches_no_remat",
    "test_train.py::test_split_params_freezing_policy",
    # 2-4s band (second re-tier pass: the >=4s pass landed at 300s wall,
    # still over the 180s budget)
    "test_aux_components.py::test_value_head",
    "test_checkpoint.py::test_trainable_only_and_pruning",
    "test_flash_attention.py::test_grads_match_reference[False]",
    "test_flash_attention.py::test_rect_blocks_triangle_grid",
    "test_int4.py::test_int4_decoder_decode",
    "test_int4_cache.py::test_decode_attention_int4_matches_dequant",
    "test_int4_cache.py::test_engine_generate_int4_cache",
    "test_int8_cache.py::test_batcher_int8_cache",
    "test_int8_cache.py::test_engine_generate_int8_cache",
    "test_megakernel.py::test_full_layer_megakernel_appends_cache",
    "test_megakernel.py::test_megakernel_stacked_cache_mode",
    "test_models.py::test_clip_shapes",
    "test_models.py::test_decoder_causality",
    "test_models.py::test_decoder_forward[mpt]",
    "test_presets.py::test_preset_converter_roundtrip[falcon7b]",
    "test_presets.py::test_preset_traces_and_param_count[llama7b-video]",
    "test_presets.py::test_preset_traces_and_param_count[mpt1b]",
    "test_presets.py::test_preset_traces_and_param_count[mpt7b]",
    "test_presets.py::test_preset_traces_and_param_count[vicuna-7b]",
    "test_public_suite.py::test_ok_vqa_stemming",
    "test_ring_attention.py::test_ring_column_bias_and_ids",
    "test_ring_attention.py::test_ring_custom_vjp_grads_match_full[4-1-2-2]",
    "test_ring_attention.py::test_ring_custom_vjp_grads_match_full[4-1-4-1]",
    "test_ring_attention.py::test_ring_custom_vjp_grads_match_full[4-4-2-2]",
    "test_ring_attention.py::test_ring_custom_vjp_grads_match_full[8-2-2-2]",
    "test_scaling_shapes.py::test_partition_rules_divide_recipe_meshes[otter_mpt30b-d1f16t1]",
    "test_scaling_shapes.py::test_partition_rules_divide_recipe_meshes[otter_mpt7b-d1f4t2]",
    "test_scaling_shapes.py::test_partition_rules_divide_recipe_meshes[otter_mpt7b-d1f8t1]",
    "test_scaling_shapes.py::test_partition_rules_divide_recipe_meshes[otter_mpt7b-d2f8t1]",
    "test_seq_parallel.py::test_forward_matches_plain[llama]",
    "test_seq_parallel.py::test_fuyu_forward_matches_plain",
    "test_serve.py::test_batched_stream_fn_with_chunked_prefill_matches_engine",
    "test_session.py::test_session_divergent_history",
    "test_session.py::test_session_vision_change_restarts",
    "test_speculative.py::test_accept_resample_distribution",
    "test_surgery.py::test_fuyu_conversion_names",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        key = item.nodeid.split("/")[-1]
        if key in _RETIERED_SLOW:
            item.add_marker(pytest.mark.slow)


def pytest_addoption(parser):
    # Mirrors the reference's pre-run data-validation gate
    # (reference conftest.py:4-15, unit_tests/test_prerun.py)
    parser.addoption("--yaml-path", action="store", default=None,
                     help="training data YAML to validate (prerun gate)")


@pytest.fixture
def yaml_path(request):
    return request.config.getoption("--yaml-path")
