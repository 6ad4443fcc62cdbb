"""Test harness config: force CPU with 8 virtual devices.

Multi-chip logic is validated on a virtual device mesh (the analog of testing
multi-node collectives without a cluster); Pallas kernels run in interpret
mode. Must run before any test imports jax. Note: the axon TPU plugin
overrides the JAX_PLATFORMS env var, so the platform is forced via
jax.config as well.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import sys  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from unityraytracer_tpu.utils.compcache import enable_persistent_cache  # noqa: E402

# CPU test compiles are plentiful and deterministic — cache them across runs.
enable_persistent_cache()

import pytest  # noqa: E402

# ---------------------------------------------------------------------------
# Speed tiers (single CPU core: the full pass is ~53 min; `-m "not slow"`
# ~12 min). "slow" marks redundant-BREADTH coverage — dead-end probe
# batteries (slot/deferred/quad/oct epilogues), repeated cross-path image
# sweeps, interpret-mode soak configs — measured >=12 s each in the
# full-pass `--durations` log. The core correctness gates stay fast:
# golden scene1 regression, pallas/cluster/bvh-vs-brute identities (one
# representative parametrization per family), the Mosaic alignment guard,
# int8b4 bit-identity, and every sub-second unit test.
# ---------------------------------------------------------------------------

_SLOW_BASES = {
    # cross-path image sweeps / soak configs
    "test_deep_bounce_rr_cross_path",
    "test_rng_impl_rbg_cross_tracer",
    "test_sample_scene_shipped_quality_settings",
    "test_cli_render_and_info",
    "test_graft_entry_and_dryrun",
    "test_megakernel_sky_mxu_identical",
    "test_render_aovs_and_multipart_export",
    "test_renderer_denoised_image",
    # interpret-mode kernel breadth
    "test_sharded_accel_mid_tier_end_to_end",
    "test_bounce_split_matches_unsplit",
    "test_bounce_split_overflow_unbiased",
    "test_wavefront_parking_preserves_image_pallas",
    "test_alive_mask_preserves_live_rays_and_kills_dead_work",
    "test_binned_kernel_identical_to_unbinned",
    "test_kernel_multi_page_scene",
    "test_kernel_matches_brute_non_tile_multiple",
    "test_render_with_binning_matches_brute",
    "test_megakernel_draw_convention_layout_identity",
    "test_fuse_geom1_matches_brute",
    "test_page_sort_matches_brute",
    "test_large_sphere_set_falls_back_to_per_bounce",
    "test_single_cluster_scene",
    # dead-end probe batteries (oracle-exact, kept as documentation)
    "test_megakernel_slot_epilogue_identity",
    "test_slot_epilogue_matches_brute",
    "test_slot_epilogue_cross_word_carry",
    "test_deferred_epilogue_matches_brute",
    # multi-chip breadth (the driver dryrun re-certifies these each round)
    "test_rows_band_equivalence_deterministic",
    "test_scene_sharding_pallas_matches_single_device",
    "test_rows_scene_composed_2d_mesh_matches_rows",
    "test_sharded_preview_export_surface",
}
# Parametrized families where ONE representative stays fast.
_SLOW_PARAMS = {
    "test_megakernel_group_pass_identity": {"PASS_PAIR"},
    "test_group_pass_matches_brute": {"PASS_PAIR-split3", "PASS_PAIR-int8b4"},
    "test_group_pass_cross_word_carry": {"PASS_PAIR"},
    "test_group_pass_multi_page": {"PASS_PAIR"},
    "test_traversal_modes_match_brute": {"bitmask-True"},
}


def pytest_collection_modifyitems(config, items):
    for it in items:
        base, _, param = it.name.partition("[")
        if base in _SLOW_BASES:
            it.add_marker(pytest.mark.slow)
        elif base in _SLOW_PARAMS and param.rstrip("]") not in _SLOW_PARAMS[base]:
            it.add_marker(pytest.mark.slow)
