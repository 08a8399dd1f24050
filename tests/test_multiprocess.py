"""process_count() > 1 code paths, simulated single-process.

The reference exercises multi-rank behavior with spawned NCCL process groups
(``tests/test_utils.py:157-336``); on TPU the same invariants are properties
of pure index math + allgather-sum reductions, so they are testable by
construction: rank-strided samplers partition the data, resume indices
advance by ``batch * world``, and FID stats merge exactly across ranks.
"""

import numpy as np
import pytest

from fastgen_tpu.data.samplers import InfiniteSampler


class TestInfiniteSamplerMultiRank:
    def test_ranks_partition_each_epoch(self):
        n, world = 40, 4
        its = [iter(InfiniteSampler(n, seed=3, rank=r, num_replicas=world))
               for r in range(world)]
        epoch = [x for it in its for x in (next(it) for _ in range(n // world))]
        assert sorted(epoch) == list(range(n))

    def test_resume_is_exact_per_rank(self):
        """start_idx = iteration * batch * world resumes each rank mid-stream
        with no overlap and no gap (ref ``trainer.py:156-163`` resume math)."""
        n, world, batch = 24, 2, 3
        full = {r: [next(it) for it in [iter(InfiniteSampler(
            n, seed=1, rank=r, num_replicas=world))] for _ in range(12)]
            for r in range(world)}
        consumed_iters = 2
        start = consumed_iters * batch * world
        for r in range(world):
            resumed = iter(InfiniteSampler(n, seed=1, start_idx=start,
                                           rank=r, num_replicas=world))
            got = [next(resumed) for _ in range(6)]
            assert got == full[r][consumed_iters * batch:
                                  consumed_iters * batch + 6]

    def test_shuffle_reshuffles_across_epochs(self):
        it = iter(InfiniteSampler(10, seed=0))
        e1 = [next(it) for _ in range(10)]
        e2 = [next(it) for _ in range(10)]
        assert sorted(e1) == sorted(e2) == list(range(10))
        assert e1 != e2


class TestLoaderRankStriding:
    def test_image_loader_reads_process_env(self, monkeypatch):
        """ImageLoader derives rank/world from jax.process_* so each host
        consumes a disjoint sample stream (ref DDP-rank striding)."""
        import jax

        from fastgen_tpu.data.class_cond_dataloader import SyntheticLoader

        monkeypatch.setattr(jax, "process_index", lambda: 1)
        monkeypatch.setattr(jax, "process_count", lambda: 4)
        loader = SyntheticLoader(batch_size=2, size=16, resolution=4,
                                 shuffle=False, prefetch=0)
        assert loader.sampler.num_replicas == 4
        # rank 1, no shuffle: indices 1, 5, 9, ...
        it = iter(loader.sampler)
        assert [next(it) for _ in range(3)] == [1, 5, 9]

    def test_trainer_resume_index_formula(self):
        """sampler_start_idx = iter * batch * accum * world
        (``trainer.py:126``, ref ``trainer.py:156-163``)."""
        iter_start, batch, accum, world = 7, 32, 4, 8
        assert iter_start * batch * accum * world == 7168


class TestFIDMultiRank:
    def test_rank_strided_batches_partition(self):
        """The FID sweep's `range(rank, n_batches, world)` covers every batch
        exactly once across ranks (``compute_fid_from_ckpts.py:112-117``)."""
        n_batches, world = 13, 4
        seen = [bi for r in range(world) for bi in range(r, n_batches, world)]
        assert sorted(seen) == list(range(n_batches))

    def test_stats_merge_matches_single_process(self):
        """Summed (mu_sum, X^T X, n) across rank shards reproduce the
        single-process mu/Sigma exactly — the invariant behind the allgather
        reduction in ``fid.py::calculate_inception_stats``."""
        from scripts.fid.fid import RandomProjDetector, calculate_inception_stats

        rs = np.random.RandomState(0)
        imgs = (rs.rand(24, 8, 8, 3) * 255).astype(np.uint8)
        det = RandomProjDetector()
        mu_full, sig_full = calculate_inception_stats(
            iter([imgs[i:i + 6] for i in range(0, 24, 6)]), det)
        # two "ranks", strided batches
        shards = [[imgs[i:i + 6] for i in range(0, 24, 6)][r::2] for r in range(2)]
        dim = det.feature_dim
        mu_sum = np.zeros(dim, np.float64)
        sig_sum = np.zeros((dim, dim), np.float64)
        n = 0
        for shard in shards:
            for b in shard:
                f = det(b).astype(np.float64)
                mu_sum += f.sum(0)
                sig_sum += f.T @ f
                n += len(f)
        mu = mu_sum / n
        sigma = (sig_sum - n * np.outer(mu, mu)) / (n - 1)
        np.testing.assert_allclose(mu, mu_full, atol=1e-12)
        np.testing.assert_allclose(sigma, sig_full, atol=1e-12)
