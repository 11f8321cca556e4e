"""Worker process for tests/test_distributed.py (not a test module).

Each process holds 2 local CPU devices; together the N processes form a
global 's'-sharded mesh.  Runs the site-sharded sweep deterministically
and prints the ELBO for the parent to compare against a single-process
run.

Argv: coordinator_port process_id num_processes
"""

import sys

port, pid, nprocs = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from phylo_tpu.parallel import initialize_distributed  # noqa: E402

assert initialize_distributed(
    coordinator_address=f"localhost:{port}",
    num_processes=nprocs,
    process_id=pid,
)
assert jax.process_count() == nprocs, jax.process_count()

import jax.numpy as jnp  # noqa: E402

from phylo_tpu.dataio import simulate_dna  # noqa: E402
from phylo_tpu.models.branches import init_branch_params  # noqa: E402
from phylo_tpu.models.substitution import ReferenceQ  # noqa: E402
from phylo_tpu.parallel import (  # noqa: E402
    make_mesh,
    pad_sites,
    process_summary,
    sweep_sharding,
)
from phylo_tpu.smc.sweep import (  # noqa: E402
    SweepConfig,
    sample_phylogenies,
)

print(process_summary(), file=sys.stderr)
n_global = len(jax.devices())

ds = simulate_dna(6, 31, seed=0)   # S=31 exercises padding on the mesh
model = ReferenceQ(A=ds.A)
params = {
    "model": model.init_params(jnp.float64),
    "branches": init_branch_params(ds.N, dtype=jnp.float64),
}

mesh = make_mesh((n_global,))      # pure site mesh spanning all hosts
sh = sweep_sharding(mesh)
padded, w = pad_sites(ds.genome, sh.site_multiple())
# replicated host data -> globally sharded arrays (identical bytes on
# every process, so device_put's per-host shard slicing is consistent)
leaves = jax.device_put(jnp.asarray(padded, jnp.float64), sh.leaves)
weights = jax.device_put(jnp.asarray(w, jnp.float64), sh.sites)

# globally-sharded arrays must be ARGUMENTS of the jitted function
# (closing over non-addressable arrays is an error in multi-controller)
elbo = jax.jit(
    lambda key, lv, w: sample_phylogenies(
        key, lv, model, params, SweepConfig(K=8),
        shardings=sh, site_weights=w,
    ).elbo
)(jax.random.PRNGKey(7), leaves, weights)
print(f"ELBO {float(elbo)!r}")
