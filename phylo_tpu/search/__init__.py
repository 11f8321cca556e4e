from phylo_tpu.search.nni import (  # noqa: F401
    NNISearchResult,
    nni_neighbors,
    nni_search,
    records_to_decisions,
    tree_log_likelihoods_batch,
)
