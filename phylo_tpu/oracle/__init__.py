from phylo_tpu.oracle.reference_vcsmc import OracleVCSMC  # noqa: F401
