"""TPU smoke for the causal generator and MCI classifier at full volume."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import os, time
import numpy as np
import jax, jax.numpy as jnp

from cips_tpu.cli import common
from cips_tpu.training import causal_task, classifier_task

def main():
    rng = np.random.default_rng(0)
    shape = (1, 96, 128, 96, 1)  # best measured causal throughput (see BENCH_NOTES)

    # causal generator (reference config, 5 covariates AV45)
    cfg = common.load_config(None, "training_causal.json")
    enc, t1_dec, pet_dec, disc, perc = causal_task.build_models(cfg, n_covariates=5, dtype=jnp.bfloat16)
    state = causal_task.init_state(jax.random.key(0), enc, t1_dec, pet_dec, disc, perc,
                                   cfg["training"], (1,)+shape[1:], n_covariates=5)
    step = jax.jit(causal_task.make_train_step(enc, t1_dec, pet_dec, disc, perc, cfg["training"]), donate_argnums=0)
    batch = {"t1": jnp.asarray(rng.random(shape, np.float32), jnp.bfloat16),
             "pet": jnp.asarray(rng.random(shape, np.float32), jnp.bfloat16),
             "info": jnp.asarray(rng.random((1,1,5), np.float32), jnp.bfloat16)}
    t0=time.time(); state, m = step(state, batch, jax.random.key(1)); v=float(m["rec_pet_loss"])
    print(f"causal compile+step {time.time()-t0:.0f}s rec_pet={v:.4f}", flush=True)
    t0=time.perf_counter()
    for i in range(5): state, m = step(state, batch, jax.random.key(i))
    float(m["rec_pet_loss"]); dt=(time.perf_counter()-t0)/5
    print(f"causal step: {dt*1000:.0f} ms -> {1/dt:.2f} vol/s (batch 1)", flush=True)

    # classifier (reference atten config)
    ccfg = common.load_config(None, "training_atten.json")
    model = classifier_task.build_model(ccfg, in_channels=2, n_covariates=5, dtype=jnp.bfloat16)
    cstate = classifier_task.init_state(jax.random.key(0), model, (1, 96, 128, 96, 2), n_covariates=5)
    cstep = jax.jit(classifier_task.make_train_step(model, use_tabular=True), donate_argnums=0)
    cbatch = {"imgs": jnp.asarray(rng.random((4,96,128,96,2), np.float32), jnp.bfloat16),
              "info": jnp.asarray(rng.random((4,1,5), np.float32), jnp.bfloat16),
              "labels": jnp.asarray([0,1,0,1])}
    t0=time.time(); cstate, cm = cstep(cstate, cbatch, jax.random.key(2)); v=float(cm["ce_loss"])
    print(f"classifier compile+step {time.time()-t0:.0f}s ce={v:.4f}", flush=True)
    t0=time.perf_counter()
    for i in range(5): cstate, cm = cstep(cstate, cbatch, jax.random.key(i))
    float(cm["ce_loss"]); dt=(time.perf_counter()-t0)/5
    print(f"classifier step: {dt*1000:.0f} ms -> {4/dt:.2f} vol/s (batch 4)", flush=True)

if __name__ == "__main__":
    main()
