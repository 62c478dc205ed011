import jax.numpy as jnp
import numpy as np
import torch

from sgs_tpu.train.optim import AdamState, adam_update, expon_lr_func


def test_adam_matches_torch():
    """Our per-field Adam must track torch.optim.Adam (the reference
    optimizer, eps=1e-15) step for step."""
    rng = np.random.default_rng(0)
    p0 = rng.normal(size=(7, 3)).astype(np.float32)
    grads = [rng.normal(size=(7, 3)).astype(np.float32) for _ in range(5)]
    lr = 0.01

    tp = torch.nn.Parameter(torch.tensor(p0))
    topt = torch.optim.Adam([tp], lr=lr, eps=1e-15)
    for g in grads:
        tp.grad = torch.tensor(g)
        topt.step()

    params = {"x": jnp.asarray(p0)}
    state = AdamState.init(params)
    for g in grads:
        params, state = adam_update(params, {"x": jnp.asarray(g)}, state, {"x": lr})
    np.testing.assert_allclose(
        np.asarray(params["x"]), tp.detach().numpy(), rtol=2e-5, atol=1e-6
    )


def test_adam_update_mask_freezes_rows():
    params = {"x": jnp.ones((4, 2))}
    state = AdamState.init(params)
    g = {"x": jnp.ones((4, 2))}
    mask = jnp.asarray([True, False, True, False])
    new_params, new_state = adam_update(params, g, state, {"x": 0.1}, update_mask=mask)
    x = np.asarray(new_params["x"])
    assert (x[0] != 1.0).all() and (x[2] != 1.0).all()
    assert (x[1] == 1.0).all() and (x[3] == 1.0).all()
    assert np.asarray(new_state.mu["x"])[1].max() == 0.0


def test_zero_slots_surgery():
    params = {"x": jnp.ones((4, 2))}
    state = AdamState.init(params)
    _, state = adam_update(params, {"x": jnp.ones((4, 2))}, state, {"x": 0.1})
    state2 = state.zero_slots("x", jnp.asarray([False, True, False, False]))
    mu = np.asarray(state2.mu["x"])
    assert mu[1].max() == 0.0 and mu[0].min() > 0.0
    # step preserved (torch keeps the tensor-level step across surgery)
    assert int(state2.step["x"]) == 1


def test_expon_lr_matches_reference_formula():
    """Re-derive the reference helper numerically (utils/general_utils.py:29-62)."""
    # with lr_delay_steps=0 there is no ramp (the reference default):
    f2 = expon_lr_func(lr_init=1.6e-4, lr_final=1.6e-6, lr_delay_mult=0.01, max_steps=30_000)
    np.testing.assert_allclose(f2(0), 1.6e-4, rtol=1e-9)
    np.testing.assert_allclose(f2(30_000), 1.6e-6, rtol=1e-9)
    np.testing.assert_allclose(f2(15_000), np.sqrt(1.6e-4 * 1.6e-6), rtol=1e-9)
    assert f2(-1) == 0.0
    # delay ramp: at step 0 with delay_steps>0, lr = init * delay_mult
    f3 = expon_lr_func(1e-2, 1e-4, lr_delay_steps=100, lr_delay_mult=0.1, max_steps=1000)
    np.testing.assert_allclose(f3(0), 1e-3, rtol=1e-9)
