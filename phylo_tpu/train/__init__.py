from phylo_tpu.train.trainer import TrainConfig, train  # noqa: F401
from phylo_tpu.train.minibatch import site_batches  # noqa: F401
from phylo_tpu.train.elastic import train_elastic  # noqa: F401
