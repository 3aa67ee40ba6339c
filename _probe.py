import time, json
import jax, jax.numpy as jnp, numpy as np
from skge_tpu import AdaGrad, SharedNegativeSampler, init_state, make_epoch_fn, make_pairwise_step
from skge_tpu.models import TransE
from skge_tpu.data import latent_kg
from skge_tpu.evaluation import FilteredRankingEval

def run(ld, k, epochs, margin, lr, ncomp=150):
    ds = latent_kg(n_entities=40943, n_relations=18, n_train=141442,
                   n_valid=2000, n_test=2000, latent_dim=ld, seed=0)
    model = TransE(ds.n_entities, ds.n_relations, ncomp, l1=False)
    opt = AdaGrad(lr=lr)
    sampler = SharedNegativeSampler(ds.n_entities, k=k)
    step = make_pairwise_step(model, opt, sampler, margin=margin, aggregate="dense")
    epoch = jax.jit(make_epoch_fn(step, ds.train.shape[0], 100), donate_argnums=(0,))
    state = init_state(model, opt, jax.random.PRNGKey(0))
    t0 = time.perf_counter()
    for _ in range(epochs): state, m = epoch(state, xs := jnp.asarray(ds.train))
    np.asarray(m.loss)
    ev = FilteredRankingEval(model, ds.test, ds.all_triples(), batch_size=1000)
    r = ev(state.params)
    print(json.dumps({"ld": ld, "k": k, "ep": epochs, "margin": margin, "lr": lr,
          "mrr": round(r.mrr, 4), "h10": round(r.hits[10], 3),
          "t": round(time.perf_counter()-t0, 1)}), flush=True)

run(16, 1024, 200, 1.0, 0.1)
run(32, 4096, 200, 1.0, 0.1)
run(32, 1024, 200, 0.5, 0.2)
