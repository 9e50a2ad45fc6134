"""Tests for the GOP scheduler and tracing utilities."""

import numpy as np

from memcnet_tpu.parallel.gop import Gop, GopScheduler, split_gops
from memcnet_tpu.utils.tracing import StageTimers, frames_per_second


class TestSplitGops:
    def test_pairs_cover_stream_exactly_once(self):
        # demo_HD720p geometry: frames 0..100 step 2 -> pairs (0,2), (2,4), ...
        n, step = 101, 2
        gops = split_gops(n, gop_len=16, step=step)
        pairs = [p for g in gops for p in g.pairs()]
        want = [(i, i + step, i + 1) for i in range(0, n - step, step)]
        assert pairs == want

    def test_pairs_cover_various_sizes(self):
        for n in (7, 16, 17, 33, 100):
            for gop_len in (4, 8, 16):
                gops = split_gops(n, gop_len=gop_len, step=2)
                pairs = [p[0] for g in gops for p in g.pairs()]
                assert pairs == list(range(0, n - 2, 2)), (n, gop_len)

    def test_gop_ids_sequential(self):
        gops = split_gops(64, gop_len=8)
        assert [g.gop_id for g in gops] == list(range(len(gops)))


class TestScheduler:
    def test_partition_across_hosts(self):
        n_hosts = 4
        scheds = [
            GopScheduler(200, gop_len=16, process_index=i, process_count=n_hosts)
            for i in range(n_hosts)
        ]
        all_ids = sorted(g.gop_id for s in scheds for g in s.local_gops())
        assert all_ids == [g.gop_id for g in scheds[0].gops]
        # near-even split
        sizes = [len(s.local_gops()) for s in scheds]
        assert max(sizes) - min(sizes) <= 1

    def test_journal_resume(self, tmp_path):
        j = tmp_path / "journal.txt"
        s = GopScheduler(100, gop_len=16, process_index=0, process_count=1,
                         journal_path=str(j))
        first = s.pending()[0]
        s.mark_done(first)
        assert first.gop_id not in {g.gop_id for g in s.pending()}
        # restart: journal is re-read
        s2 = GopScheduler(100, gop_len=16, process_index=0, process_count=1,
                          journal_path=str(j))
        assert first.gop_id not in {g.gop_id for g in s2.pending()}
        d, t = s2.progress()
        assert d == 1 and t == len(s2.local_gops())


class TestTracing:
    def test_stage_timers(self):
        t = StageTimers()
        for _ in range(3):
            with t.item():
                with t.model():
                    pass
        assert t.total.count == 3
        assert t.proc.count == 3
        assert "3 items" in t.summary()

    def test_frames_per_second(self):
        r = frames_per_second(50, 5.0, n_chips=4)
        assert np.isclose(r["frames_per_s"], 10.0)
        assert np.isclose(r["frames_per_s_per_chip"], 2.5)
