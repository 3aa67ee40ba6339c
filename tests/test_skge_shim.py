"""The `skge` namespace shim: reference user code runs UNMODIFIED."""

import numpy as np


def test_reference_readme_usage_via_skge_namespace():
    # this block is written exactly as a scikit-kge user would write it
    from skge import HolE, PairwiseStochasticTrainer
    from skge import sample

    rng = np.random.default_rng(0)
    n_e, n_r = 40, 5
    xs = [
        (int(s), int(o), int(p))
        for s, o, p in zip(
            rng.integers(0, n_e, 300),
            rng.integers(0, n_e, 300),
            rng.integers(0, n_r, 300),
        )
    ]
    ys = [1.0] * len(xs)

    model = HolE((n_e, n_e, n_r), 12)
    sampler = sample.RandomModeSampler(1, [0, 1], xs, (n_e, n_e, n_r))
    seen = []
    trainer = PairwiseStochasticTrainer(
        model,
        nbatches=5,
        max_epochs=4,
        margin=0.2,
        samplef=sampler.sample,
        post_epoch=[lambda t: seen.append(t.nviolations) or True],
    )
    trainer.fit(xs, ys)
    assert len(seen) == 4
    assert model.params["E"].shape == (n_e, 12)


def test_skge_submodules_resolve(tmp_path):
    from skge import Config, Model, actfun, base, param, util
    from skge import TransE

    assert actfun.Sigmoid.g_given_f(np.array(0.5)) == 0.25
    a = np.arange(4.0)
    np.testing.assert_allclose(
        util.ccorr(a, a), util.cconv(a[[0, 3, 2, 1]], a), atol=1e-9
    )
    m = TransE((10, 10, 3), 4)
    fn = str(tmp_path / "m.bin")
    m.save(fn)
    m2 = Model.load(fn)
    np.testing.assert_allclose(m2.params["E"], m.params["E"])
    assert base.PairwiseStochasticTrainer is not None
    assert param.AdaGrad is not None
    assert Config is not None
