"""Test configuration: force an 8-device virtual CPU platform so sharding and
collective code paths are exercised without TPU hardware (SURVEY.md §4).

The container pre-loads a TPU PJRT plugin through a PYTHONPATH sitecustomize
(`/root/.axon_site`) that initializes the (slow, single-chip, tunneled)
backend at interpreter start and ignores later JAX_PLATFORMS overrides — so
when we detect it, we re-exec the test process once with a scrubbed
environment."""

import os
import sys

_AXON_SITE = ".axon_site"

_NEEDS_REEXEC = (
    _AXON_SITE in os.environ.get("PYTHONPATH", "")
    and os.environ.get("_MMSAE_TESTS_REEXEC") != "1"
)

if _NEEDS_REEXEC:
    # Defer the re-exec to pytest_cmdline_main so the child re-runs pytest's
    # ACTUAL invocation (config.invocation_params.args) — sys.argv is wrong
    # when pytest runs programmatically (pytest.main from a wrapper/IDE).
    # Do NOT import jax in this doomed parent process.
    def pytest_cmdline_main(config):
        import subprocess

        env = dict(os.environ)
        env["PYTHONPATH"] = os.pathsep.join(
            p
            for p in env.get("PYTHONPATH", "").split(os.pathsep)
            if _AXON_SITE not in p
        )
        env["_MMSAE_TESTS_REEXEC"] = "1"
        env["JAX_PLATFORMS"] = "cpu"
        flags = env.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            env["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count=8"
            ).strip()
        return subprocess.run(
            [
                sys.executable,
                "-m",
                "pytest",
                *config.invocation_params.args,
            ],
            env=env,
        ).returncode

else:
    # Plain environment (no axon sitecustomize), or the re-exec'd child:
    # set the same knobs in-process.
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    os.environ.setdefault("JAX_ENABLE_X64", "0")

    # Make the repo importable when PYTHONPATH was scrubbed by the re-exec.
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    import jax

    jax.config.update("jax_default_matmul_precision", "highest")
