"""Test configuration: run JAX on a virtual 8-device CPU mesh.

TPU hardware is not needed for correctness tests; sharding tests use the
host-platform device-count override.
"""

import os

# force, don't setdefault: the environment carries JAX_PLATFORMS=axon (the
# remote TPU relay) and running unit tests through the relay is ~10x slower
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import pathlib

import jax
import numpy as np
import pytest

# The env-var force above is not enough on its own: the axon sitecustomize
# imports jax at interpreter boot and explicitly config.update()s
# jax_platforms="axon,cpu", which outranks the env var.  Without this
# explicit re-update the first array op initializes the axon backend — and
# when the TPU relay is unreachable that init blocks forever, hanging the
# whole suite before any output.
jax.config.update("jax_platforms", "cpu")

# Checkpoint-parity tests need exact fp32 convolutions; the platform default
# is reduced-precision (bf16-class) accumulation.
jax.config.update("jax_default_matmul_precision", "highest")

# XLA:CPU compiles dominate suite runtime on this 1-core host (the four
# biggest fast tests are ~120s of pure compile); persist them across runs
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("RVDD_TEST_CACHE", "/tmp/rvdd_test_xla_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
jax.config.update("jax_persistent_cache_enable_xla_caches", "all")

GOLDEN_DIR = pathlib.Path(__file__).parent / "golden"


def pytest_collection_modifyitems(config, items):
    """Everything not marked slow is the 'fast' smoke subset (-m fast)."""
    for item in items:
        if "slow" not in item.keywords:
            item.add_marker(pytest.mark.fast)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Release dead compiled executables between test modules.

    A full-suite run compiles hundreds of XLA:CPU programs; with them all
    pinned by jit caches, the final giant interpret-mode compile
    (test_fused_minigolden's ConvNeXt flagship) segfaults inside
    backend_compile_and_load — deterministically at the same test, only
    when enough modules ran first (bisect: any 3-file subset passes, the
    8-file set crashes).  Dropping caches at module boundaries keeps the
    JIT code space bounded; cross-module recompiles are rare since
    modules rarely share jitted functions."""
    import jax

    jax.clear_caches()
    yield


@pytest.fixture
def pallas_interpret(monkeypatch):
    """Route every pallas_call through the interpreter (CPU evidence path:
    same kernel semantics incl. bf16 rounding, no TPU needed).  One patch
    on the shared jax.experimental.pallas module covers every kernel
    module — they all hold the same `pl` object."""
    import jax.experimental.pallas as pl_mod

    orig = pl_mod.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(pl_mod, "pallas_call", patched)
    yield


@pytest.fixture(scope="session")
def golden():
    """Load a golden fixture .npz by name, or skip if not generated."""

    def _load(name: str):
        path = GOLDEN_DIR / f"{name}.npz"
        if not path.exists():
            pytest.skip(f"golden fixture {name}.npz not generated (run tools/make_goldens.py)")
        return np.load(path, allow_pickle=True)

    return _load


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
