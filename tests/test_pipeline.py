"""DataLoader determinism: random-segment sampling must be identical for
any worker count (the reference's torch DataLoader gets this from per-worker
process seeding; our thread-pool loader gets it from per-(seed, epoch, idx)
generators — a shared np.random.Generator is not thread-safe and raced in
round 4)."""
import numpy as np

from tfswa_tpu.data.pipeline import DataLoader
from tfswa_tpu.data.synthetic import SyntheticDataset


def _collect_epochs(num_workers: int, epochs: int = 2):
    ds = SyntheticDataset(
        num_tracks=6, track_seconds=2.0, segment_seconds=0.5,
        sample_rate=4000, random_segments=True, seed=7,
    )
    loader = DataLoader(
        ds, batch_size=2, shuffle=True, num_workers=num_workers, seed=3
    )
    out = []
    for _ in range(epochs):
        out.append([(mix.copy(), {k: v.copy() for k, v in tgt.items()})
                    for mix, tgt in loader])
    return out


def test_loader_deterministic_across_worker_counts():
    seq = _collect_epochs(num_workers=0)
    par = _collect_epochs(num_workers=2)
    assert len(seq) == len(par)
    for epoch_s, epoch_p in zip(seq, par):
        assert len(epoch_s) == len(epoch_p)
        for (mix_s, tgt_s), (mix_p, tgt_p) in zip(epoch_s, epoch_p):
            np.testing.assert_array_equal(mix_s, mix_p)
            for k in tgt_s:
                np.testing.assert_array_equal(tgt_s[k], tgt_p[k])


def test_loader_resamples_segments_across_epochs():
    """set_epoch must advance the segment stream: two epochs over the same
    random-segment dataset should not draw identical segments."""
    e1, e2 = _collect_epochs(num_workers=0, epochs=2)
    diffs = [
        not np.array_equal(m1, m2)
        for (m1, _), (m2, _) in zip(e1, e2)
    ]
    assert any(diffs)


def test_set_epoch_reproducibility():
    """Same (seed, epoch, idx) -> same sample, regardless of call order."""
    ds = SyntheticDataset(
        num_tracks=4, track_seconds=2.0, segment_seconds=0.5,
        sample_rate=4000, random_segments=True, seed=11,
    )
    ds.set_epoch(5)
    a_first = ds[3][0]
    _ = ds[0], ds[1], ds[2]  # interleave other reads
    a_again = ds[3][0]
    np.testing.assert_array_equal(a_first, a_again)
