"""Test harness configuration.

Unit tests run on a virtual 8-device CPU mesh so multi-chip sharding logic is
exercised without TPU hardware (the same trick real JAX frameworks use for
"multi-node without a cluster" — see SURVEY.md §4).  The real-TPU benchmark
path is exercised separately by bench.py.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# The axon sitecustomize forces jax_platforms="axon,cpu" at interpreter
# startup; override it back to CPU before any backend initializes so unit
# tests never touch the TPU tunnel.
import jax

jax.config.update("jax_platforms", "cpu")

import pathlib

import pytest

# Scene/texture fixtures: the reference checkout's data/ tree, relocatable
# via CHESS2RT_DATA_DIR (same env var the app honors, raytracer_demo.d:27).
REFERENCE_DATA = pathlib.Path(os.environ.get("CHESS2RT_DATA_DIR", "/root/reference/data"))


# NOTE on process isolation (round-4 VERDICT item 3): the slow tier's
# interpret-mode fused-kernel programs accumulate enough XLA CPU
# executables that a single-process full-suite run eventually SIGABRTs
# the compiler (observed in test_parallel).  The full suite therefore
# runs through tests/run_suite.py, which executes the fast tier in one
# process and each slow-tier FILE in its own pytest subprocess.  The
# previous in-process band-aid (an autouse jax.clear_caches() after a
# hand-maintained list of heavy modules) was ordering-dependent and is
# gone.


@pytest.fixture(scope="session")
def data_dir() -> pathlib.Path:
    if not REFERENCE_DATA.exists():
        pytest.skip(f"scene data dir not found: {REFERENCE_DATA} (set CHESS2RT_DATA_DIR)")
    return REFERENCE_DATA


# ---------------------------------------------------------------------------
# Fast/slow tiers (round-3 VERDICT item 8).  The full suite is ~24 min of
# interpret-mode kernel compiles; CI and the inner dev loop run
# `-m "not slow"` (~3 min).  Tests are assigned to the slow tier centrally
# here, by measured duration (>= ~5.5 s on the reference box, pytest
# --durations, 2026-08-19) — heavy interpret-mode fused-kernel parity and
# grad checks.  Core f32/f64 oracle-parity tests stay in the fast tier
# regardless of cost.  Explicit @pytest.mark.slow decorators (fused-mesh
# tests) compose with this list.
_SLOW_NODES = {
    "tests/test_pallas.py::TestKernelParity::test_texel_tap_reuse_bitexact",
    "tests/test_pallas.py::TestKernelParity::test_adaptive_aa_fused_matches_xla",
    "tests/test_pallas.py::TestKernelParity::test_chunked_fused_matches_unchunked",
    "tests/test_pallas.py::TestKernelParity::test_adaptive_aa_dof_and_gi_fused",
    "tests/test_pallas.py::TestKernelParity::test_block_bounce_mode_bitexact",
    "tests/test_pallas.py::TestKernelParity::test_fullwidth_bounce_mode_bitexact",
    "tests/test_pallas.py::TestKernelParity::test_mixed_scene_phong_sphere_cube",
    "tests/test_pallas.py::TestKernelParity::test_lecture4_checker",
    "tests/test_pallas.py::TestKernelParity::test_reflection_bounces",
    "tests/test_pallas.py::TestKernelParity::test_lecture5_flagship",
    "tests/test_pallas.py::TestMergedEnvBitmapGather::test_grads_match_plain_modes",
    "tests/test_pallas.py::TestRefraction::test_refraction_matches_xla",
    "tests/test_pallas.py::TestMonteCarloModes::test_dof_matches_xla_same_keys",
    "tests/test_pallas_grad.py::TestWhittedGrads::test_flagship_grads_match_xla",
    "tests/test_pallas_grad.py::TestWhittedGrads::test_fd_check_light_color",
    "tests/test_pallas_grad.py::TestWhittedGrads::test_lecture4_grads_match_xla",
    "tests/test_pallas_grad.py::TestWhittedGrads::test_camera_grads_flow",
    "tests/test_pallas_grad.py::TestWhittedGrads::test_aa_grads",
    "tests/test_pallas_grad.py::TestGIGrads::test_gi_grads_match_xla",
    "tests/test_pallas_grad.py::TestLeafPins::test_leaf_vs_node_pin_grads",
    "tests/test_pallas_grad.py::TestLeafPins::test_leaf_pins_identify_winners",
    "tests/test_inverse.py::test_all_grad_leaves_finite_flagship",
    "tests/test_inverse.py::TestTexelGradModes::test_modes_agree_and_match_fd",
    "tests/test_parallel.py::TestMultiProcess::test_two_process_bringup_matches_in_process",
    "tests/test_parallel.py::TestShardedGrad::test_loss_and_grads_match_single_device",
    "tests/test_parallel.py::TestShardedGrad::test_grad_descent_step_reduces_loss",
    "tests/test_parallel.py::TestShardedGrad::test_adaptive_aa_grads_match_single_device",
    "tests/test_parallel.py::TestMesh2D::test_grads_match_1d_mesh",
    "tests/test_parallel.py::TestCheckpointRestart::test_restart_trajectory_exact",
    "tests/test_gi.py::TestGiNeeExtension::test_gi_gradients_fused_matches_xla",
    "tests/test_gi.py::TestGiNeeExtension::test_kernel_gi_per_pixel_z_score",
    "tests/test_gi.py::TestGiNeeExtension::test_gi_gradients_match_fd",
    "tests/test_gi.py::TestGiNeeExtension::test_gi_path_batch_matches_sequential",
    "tests/test_gi.py::TestGiNeeExtension::test_per_pixel_z_score",
    "tests/test_gi.py::TestGiNeeExtension::test_gi_chunk_pixels_composes_with_fused",
    "tests/test_bump.py::TestBumpGrads::test_grads_finite_through_bump",
    "tests/test_fuzz.py::TestFuzzPallasKernel::test_random_scene_matches_xla",
    "tests/test_parity.py::TestDifferentiability::test_grad_flows_to_scene_params",
    "tests/test_parity.py::TestExtensions::test_adaptive_aa_device_matches_oracle_lecture5",
    "tests/test_diagnostics.py::TestCubemap::test_cubemap_gradient_flows",
}


def pytest_collection_modifyitems(config, items):
    seen = set()
    files = set()
    for item in items:
        node = item.nodeid.split("[")[0]
        files.add(node.split("::")[0])
        if node in _SLOW_NODES:
            seen.add(node)
            item.add_marker(pytest.mark.slow)
    # a renamed/moved test must not silently drop out of the slow tier
    # (it would blow the fast-tier CI budget unnoticed).  Only enforced
    # when collection was NOT narrowed (no node ids / -k), and only for
    # files that were collected — file- and directory-scoped runs stay
    # usable.
    narrowed = bool(getattr(config.option, "keyword", "")) or any(
        "::" in str(a) for a in config.args
    )
    if not narrowed:
        stale = {n for n in _SLOW_NODES - seen if n.split("::")[0] in files}
        assert not stale, f"stale _SLOW_NODES entries (renamed tests?): {sorted(stale)}"
