"""REAL two-process integration tests (subprocess pairs over
jax.distributed + gloo CPU collectives): launch-layer barrier/gather
correctness and DP-training parity — the paths the reference exercised with
torchrun that world=1 tests cannot cover (VERDICT r2 items 1 & 5).

Each test spawns N python processes with COORDINATOR_ADDRESS/NUM_PROCESSES/
PROCESS_ID env vars; `parallel.initialize_distributed` picks them up and
configures gloo before backend init.  The axon TPU sitecustomize and the
8-virtual-device XLA flag are stripped so each process owns exactly one CPU
device."""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DRIVERS = os.path.join(REPO, "tests", "mp_drivers")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _mp_env(num_processes: int, port: int, rank: int) -> dict:
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        [REPO]
        + [
            p
            for p in env.get("PYTHONPATH", "").split(os.pathsep)
            if p and ".axon_site" not in p
        ]
    )
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = " ".join(
        f
        for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    )
    env["COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
    env["NUM_PROCESSES"] = str(num_processes)
    env["PROCESS_ID"] = str(rank)
    return env


def run_procs(script: str, args, num_processes: int = 2, timeout: int = 240):
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(DRIVERS, script), *map(str, args)],
            env=_mp_env(num_processes, port, rank),
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for rank in range(num_processes)
    ]
    outs = []
    failed = False
    for p in procs:
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
            out += "\n<TIMEOUT>"
            failed = True
        outs.append(out)
        failed = failed or p.returncode != 0
    if failed:
        banner = "\n".join(
            f"--- rank {i} (rc={p.returncode}) ---\n{o}"
            for i, (p, o) in enumerate(zip(procs, outs))
        )
        pytest.fail(f"multi-process run failed:\n{banner}")
    return outs


def test_collectives_two_process(tmp_path):
    run_procs("mp_collectives.py", [tmp_path])
    assert (tmp_path / "ok.0").exists() and (tmp_path / "ok.1").exists()


@pytest.fixture(scope="module")
def token_dataset(tmp_path_factory):
    """16 pre-tokenized rows (vocab 64, S=8), saved to disk for the drivers."""
    from datasets import Dataset

    rng = np.random.default_rng(0)
    ds = Dataset.from_dict(
        {"input_ids": rng.integers(0, 64, size=(16, 8)).tolist()}
    )
    d = tmp_path_factory.mktemp("tokens")
    ds.save_to_disk(str(d))
    return str(d)


def _make_sae_dir(tmp_path, d_in=32, num_latents=64, k=4):
    import jax

    from multimodal_sae_tpu.config import SaeConfig
    from multimodal_sae_tpu.sae import Sae

    sae_dir = tmp_path / "saes"
    Sae(
        d_in, SaeConfig(num_latents=num_latents, k=k), key=jax.random.PRNGKey(0)
    ).save_to_disk(sae_dir / "layers.1")
    return str(sae_dir)


def test_cache_two_process_merge_contains_both_ranks(token_dataset, tmp_path):
    """The merge-race regression test: rank 1's save_splits is delayed 3 s;
    the barrier must still get every rank's rows into the merged files, and
    the merged cache must equal a single-process run byte-for-byte."""
    from safetensors.numpy import load_file

    sae_dir = _make_sae_dir(tmp_path)
    save_dir = tmp_path / "cache_mp"
    run_procs("mp_cache.py", [token_dataset, sae_dir, save_dir])

    module_dir = save_dir / "layers.1"
    files = sorted(os.listdir(module_dir))
    assert all(not f.startswith("Rank") for f in files), f"unmerged shards: {files}"
    assert len(files) == 2  # n_splits=2

    rows = set()
    total = 0
    for f in files:
        data = load_file(str(module_dir / f))
        rows.update(np.unique(data["locations"][:, 0]).tolist())
        total += len(data["activations"])
    # 16 dataset rows; both ranks' halves (0-7 from rank 0, 8-15 from rank 1)
    # must be present — the pre-fix race dropped the late rank's rows.
    assert rows == set(range(16)), f"missing rows: {sorted(set(range(16)) - rows)}"
    assert total == 16 * 8 * 4  # rows * seq * k

    # Byte-parity with a single-process run of the same CLI (same shard
    # order: rank files are merged rank-ascending = dataset order).
    from multimodal_sae_tpu.config import CacheConfig
    from multimodal_sae_tpu.launch.cache import cache as cache_cli

    solo_dir = tmp_path / "cache_solo"
    cache_cli.main(
        CacheConfig(
            model="synthetic://32,3,64",
            dataset=token_dataset,
            sae_path=sae_dir,
            save_dir=str(solo_dir),
            batch_size=2,
            ctx_len=8,
            n_splits=2,
        )
    )
    for f in files:
        a = (module_dir / f).read_bytes()
        b = (solo_dir / "layers.1" / f).read_bytes()
        assert a == b, f"{f} differs between 1-process and 2-process runs"


def test_dp_training_two_process_matches_single(token_dataset, tmp_path):
    """Two-process DP (2 procs x 1 CPU device) must match a single-process
    run on a 2-virtual-device mesh with the SAME per-device shard contents:
    strided rank shards are interleaved back into the oracle's batch order
    (reference torchrun DP = dataset.shard(world, rank), __main__.py:164-166)."""
    from datasets import Dataset

    run_dir = tmp_path / "run_mp"
    run_procs("mp_train.py", [token_dataset, run_dir], timeout=360)

    # Oracle: single process, 2 virtual devices, batch 4, rows reordered so
    # device shards equal the two-process layout (HF shard() is contiguous:
    # rank 0 owns rows 0-7, rank 1 rows 8-15; step s consumes local rows
    # [2s, 2s+1] on each): [2s, 2s+1, 8+2s, 8+2s+1].
    order = []
    for s in range(4):
        order += [2 * s, 2 * s + 1, 8 + 2 * s, 8 + 2 * s + 1]
    ds = Dataset.load_from_disk(token_dataset).with_format("numpy").select(order)

    oracle_script = os.path.join(DRIVERS, "mp_train_oracle.py")
    env = _mp_env(1, _free_port(), 0)
    for k in ("COORDINATOR_ADDRESS", "NUM_PROCESSES", "PROCESS_ID"):
        env.pop(k)
    env["XLA_FLAGS"] = (
        env["XLA_FLAGS"] + " --xla_force_host_platform_device_count=2"
    ).strip()
    ds_dir = tmp_path / "oracle_ds"
    ds.save_to_disk(str(ds_dir))
    run_oracle = subprocess.run(
        [sys.executable, oracle_script, str(ds_dir), str(tmp_path / "run_solo")],
        env=env,
        capture_output=True,
        text=True,
        timeout=360,
    )
    assert run_oracle.returncode == 0, run_oracle.stdout + run_oracle.stderr

    from safetensors.numpy import load_file

    mp = load_file(str(run_dir / "layers.1" / "sae.safetensors"))
    solo = load_file(str(tmp_path / "run_solo" / "layers.1" / "sae.safetensors"))
    assert set(mp) == set(solo)
    for key in mp:
        np.testing.assert_allclose(
            mp[key], solo[key], rtol=1e-5, atol=1e-6, err_msg=key
        )

    st_mp = json.loads((run_dir / "state.json").read_text())
    st_solo = json.loads((tmp_path / "run_solo" / "state.json").read_text())
    assert st_mp["opt_step"] == st_solo["opt_step"] == 2
