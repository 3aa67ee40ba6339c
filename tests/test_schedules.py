"""LR schedules (build-scope; VERDICT r2 ask 4): closed-form values,
exact per-step lr application on every optimizer, trajectory equivalence
to manually-swept constant-lr optimizers, and checkpoint-safe resume
(position = TrainState.step)."""

import numpy as np
import pytest

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

from skge_tpu import (  # noqa: E402
    SGD,
    AdaGrad,
    Adam,
    RandomModeSampler,
    TransE,
    WarmupCosine,
    WarmupLinear,
    init_state,
    make_pairwise_step,
    make_schedule,
)

N_E, N_R, D, B = 40, 4, 6, 16


def np_linear(step, warmup, total, min_scale):
    w = min(step / max(warmup, 1), 1.0) if warmup > 0 else 1.0
    span = max(total - warmup, 1)
    frac = min(max((step - warmup) / span, 0.0), 1.0)
    return w * (1.0 - (1.0 - min_scale) * frac)


def np_cosine(step, warmup, total, min_scale):
    w = min(step / max(warmup, 1), 1.0) if warmup > 0 else 1.0
    span = max(total - warmup, 1)
    frac = min(max((step - warmup) / span, 0.0), 1.0)
    cos = 0.5 * (1.0 + np.cos(np.pi * frac))
    return w * (min_scale + (1.0 - min_scale) * cos)


@pytest.mark.parametrize("warmup,total,min_scale", [
    (0, 100, 0.0), (10, 100, 0.0), (10, 100, 0.1), (0, 1, 0.5),
])
def test_schedule_closed_form(warmup, total, min_scale):
    lin = WarmupLinear(warmup=warmup, total=total, min_scale=min_scale)
    cos = WarmupCosine(warmup=warmup, total=total, min_scale=min_scale)
    for step in [0, 1, warmup, warmup + 1, total // 2, total, total + 50]:
        np.testing.assert_allclose(
            float(lin(step)), np_linear(step, warmup, total, min_scale),
            rtol=1e-6, err_msg=f"linear step={step}",
        )
        np.testing.assert_allclose(
            float(cos(step)), np_cosine(step, warmup, total, min_scale),
            rtol=1e-6, err_msg=f"cosine step={step}",
        )


def test_schedule_endpoints():
    s = WarmupCosine(warmup=5, total=50, min_scale=0.25)
    assert float(s(0)) == 0.0          # cold start under warmup
    np.testing.assert_allclose(float(s(5)), 1.0)   # warmup done
    np.testing.assert_allclose(float(s(50)), 0.25)  # floor reached
    np.testing.assert_allclose(float(s(500)), 0.25)  # constant after total


def test_make_schedule_dispatch():
    assert make_schedule(None) is None
    assert make_schedule("constant") is None
    assert isinstance(make_schedule("linear", 1, 10), WarmupLinear)
    assert isinstance(make_schedule("cosine", 1, 10, 0.2), WarmupCosine)
    with pytest.raises(KeyError):
        make_schedule("exponential")


@pytest.mark.parametrize("opt_cls", [SGD, AdaGrad, Adam])
def test_scheduled_trajectory_equals_manual_lr_sweep(opt_cls):
    """K jitted pairwise steps with a scheduled optimizer must produce the
    SAME trajectory as stepping manually with constant-lr optimizers set to
    lr * schedule(t) at each step t (sharing the slot state across steps).
    fp64-exact — the schedule is a pure lr multiplier."""
    sched = WarmupCosine(warmup=2, total=8, min_scale=0.1)
    model = TransE(N_E, N_R, D, dtype="float64")
    sampler = RandomModeSampler(N_E, modes=(0, 1))
    rng = np.random.default_rng(0)
    batches = [
        jnp.asarray(np.stack([
            rng.integers(0, N_E, B), rng.integers(0, N_E, B),
            rng.integers(0, N_R, B)], axis=1).astype(np.int32))
        for _ in range(5)
    ]
    mask = jnp.ones(B, jnp.float64)

    opt_s = opt_cls(lr=0.1, schedule=sched)
    step_s = jax.jit(make_pairwise_step(model, opt_s, sampler, margin=1.0))
    state = init_state(model, opt_s, jax.random.PRNGKey(7))
    for b in batches:
        state, _ = step_s(state, b, mask)

    # manual sweep: fresh constant-lr optimizer per step, shared slots
    state_m = init_state(model, opt_cls(lr=0.1), jax.random.PRNGKey(7))
    for t, b in enumerate(batches):
        opt_t = opt_cls(lr=0.1 * float(sched(t)))
        step_t = make_pairwise_step(model, opt_t, sampler, margin=1.0)
        state_m, _ = jax.jit(step_t)(state_m, b, mask)

    for pname in state.params:
        np.testing.assert_allclose(
            np.asarray(state.params[pname]),
            np.asarray(state_m.params[pname]),
            rtol=1e-12, atol=1e-14, err_msg=f"{opt_cls.__name__}/{pname}",
        )


def test_schedule_resumes_from_checkpoint_step(tmp_path):
    """Interrupt + restore mid-schedule: the continued trajectory must be
    bitwise identical to the uninterrupted one (schedule position rides the
    checkpointed TrainState.step — no extra state)."""
    from skge_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    sched = WarmupLinear(warmup=1, total=6, min_scale=0.0)
    model = TransE(N_E, N_R, D, dtype="float64")
    sampler = RandomModeSampler(N_E, modes=(0, 1))
    opt = AdaGrad(lr=0.2, schedule=sched)
    step = jax.jit(make_pairwise_step(model, opt, sampler, margin=1.0))
    rng = np.random.default_rng(1)
    batches = [
        jnp.asarray(np.stack([
            rng.integers(0, N_E, B), rng.integers(0, N_E, B),
            rng.integers(0, N_R, B)], axis=1).astype(np.int32))
        for _ in range(6)
    ]
    mask = jnp.ones(B, jnp.float64)

    full = init_state(model, opt, jax.random.PRNGKey(3))
    for b in batches:
        full, _ = step(full, b, mask)

    part = init_state(model, opt, jax.random.PRNGKey(3))
    for b in batches[:3]:
        part, _ = step(part, b, mask)
    path = str(tmp_path / "mid.npz")
    save_checkpoint(path, part)
    resumed, _meta = load_checkpoint(path)
    assert int(resumed.step) == 3
    for b in batches[3:]:
        resumed, _ = step(resumed, b, mask)

    for pname in full.params:
        np.testing.assert_array_equal(
            np.asarray(full.params[pname]), np.asarray(resumed.params[pname])
        )
