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
