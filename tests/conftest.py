"""Test configuration: force an 8-device virtual CPU mesh before JAX use.

The environment pins JAX_PLATFORMS=axon (remote TPU tunnel); tests must run
on local virtual CPU devices, so we override via jax.config (the env var is
re-exported by the axon site package and cannot be trusted).  The driver
validates the real multi-chip path separately via
__graft_entry__.dryrun_multichip.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent XLA compile cache: the heavy pipeline programs take 30-60 s
# EACH to compile on CPU (the "Very slow compile" alarm) — cached, a full
# suite re-run drops from ~16 min to a few minutes.  JAX_CACHE_DIR=""
# disables.
_cache = os.environ.get(
    "JAX_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_compile_cache"))
if _cache:
    try:
        jax.config.update("jax_compilation_cache_dir", _cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def pytest_report_header(config):
    return f"jax devices: {jax.device_count()} x {jax.devices()[0].platform}"
