import numpy as np

from phylo_tpu.dataio import dataset_from_strings
from phylo_tpu.train import TrainConfig
from phylo_tpu.train.replicas import train_replicas

STRINGS = ["ACTTTGAGAG", "ACTTTGACAG", "ACTTTGACTG", "ACTTTGACTC"]


def test_vmapped_replicas_train_independently():
    ds = dataset_from_strings(STRINGS)
    cfg = TrainConfig(
        n_particles=6, batch_size=10, num_epoch=3, optimizer="Adam",
        dtype="float64", save_artifacts=False, collect_trees=False,
        log_every=0,
    )
    out = train_replicas(ds, cfg, n_replicas=3)
    elbos = out["history"]["elbo"]
    assert elbos.shape == (3, 3)
    assert np.isfinite(elbos).all()
    # distinct seeds -> distinct trajectories
    assert len({round(float(e), 6) for e in elbos[-1]}) == 3
    # params carry the replica axis
    leaf = out["params"]["branches"]["log_rates_l"]
    assert leaf.shape[0] == 3


def test_replica_batches_cover_each_site_once_per_epoch(monkeypatch):
    # Epoch semantics: each replica's steps partition a per-epoch
    # permutation (no revisit/skip within an epoch).
    from phylo_tpu.train import replicas as mod

    seen = []
    orig = None

    ds = dataset_from_strings(STRINGS)  # S=10
    cfg = TrainConfig(
        n_particles=4, batch_size=5, num_epoch=1, optimizer="Adam",
        dtype="float64", save_artifacts=False, collect_trees=False,
        log_every=0,
    )

    import jax

    real_jit = jax.jit

    def spy_jit(fn, **kw):
        wrapped = real_jit(fn, **kw)

        def call(*args):
            if len(args) == 4:          # train_step(params, opt, keys, idx)
                seen.append(np.asarray(args[3]))
            return wrapped(*args)

        return call

    monkeypatch.setattr(mod.jax, "jit", spy_jit)
    mod.train_replicas(ds, cfg, n_replicas=2)
    # 2 steps of batch 5 over S=10: per replica the union is 0..9 exactly
    assert len(seen) == 2
    per_replica = np.concatenate(seen, axis=1)   # (R, S)
    for r in range(2):
        assert sorted(per_replica[r].tolist()) == list(range(10))
