"""Multi-chip training step: camera-batch data parallelism over a mesh.

Each device renders + differentiates its own shard of a camera batch
against the replicated Gaussian pool; parameter gradients are pmean'd over
the "data" axis (XLA routes the all-reduce over ICI) and the Adam update
runs replicated. Densification stats reduce with psum so every device sees
global visit counts. This is the natural 3DGS data-parallel mode (batch
size = device count) — the reference has no distributed mode at all.

Built on shard_map so collectives are explicit and the per-device compute
is exactly the single-chip train_step math.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from sgs_tpu.core.camera import Camera
from sgs_tpu.models.gaussians import DensifyStats
from sgs_tpu.ops.ssim import l1_loss, ssim
from sgs_tpu.render.pipeline import render
from sgs_tpu.train.loop import TrainState
from sgs_tpu.train.optim import adam_update


def stack_cameras(cams) -> Camera:
    """Stack equal-resolution cameras into one batched Camera pytree."""
    leaves = [
        [c.world_view_transform for c in cams],
        [c.full_proj_transform for c in cams],
        [c.camera_center for c in cams],
        [c.tanfovx for c in cams],
        [c.tanfovy for c in cams],
    ]
    w, h = cams[0].image_width, cams[0].image_height
    assert all(c.image_width == w and c.image_height == h for c in cams)
    stacked = [jnp.stack(x) for x in leaves]
    return Camera(
        world_view_transform=stacked[0],
        full_proj_transform=stacked[1],
        camera_center=stacked[2],
        tanfovx=stacked[3],
        tanfovy=stacked[4],
        image_width=w,
        image_height=h,
    )


def make_dp_train_step(
    mesh: Mesh,
    active_sh_degree: int,
    lambda_dssim: float = 0.2,
    freeze_xyz: bool = False,
    axis: str = "data",
    mode: str = "tiled",
    max_instances: int = 0,
    backend: str = "xla",
    apply_update: bool = True,
    max_row_instances: int = 0,
):
    """Build a jitted sharded train step.

    Call signature: step(state, cam_batch, gt_batch (B,3,H,W), bg (3,), lrs)
    where B == mesh.shape[axis]. Returns (state, metrics).
    """

    def per_device(params, alive, camera_b, gt_b, bg, tap_b):
        """camera_b/gt_b carry this device's local batch (size Bl)."""

        def one_camera(camera, gt, tap):
            def loss_fn(p, t):
                pool_like = _InputBundle(p, alive, active_sh_degree)
                out = render(
                    camera, pool_like.render_inputs(), bg, vspace_tap=t,
                    mode=mode, max_instances=max_instances or None,
                    backend=backend, max_row_instances=max_row_instances,
                )
                image = out["render"]
                ll1 = l1_loss(image, gt)
                loss = (1 - lambda_dssim) * ll1 + lambda_dssim * (
                    1 - ssim(image, gt)
                )
                return loss, (
                    ll1, out["radii"], out["visibility_filter"],
                    out["overflow"],
                )

            (loss, (ll1, radii, vis, ovf)), grads = jax.value_and_grad(
                loss_fn, argnums=(0, 1), has_aux=True
            )(params, tap)
            return loss, ll1, radii, vis, ovf, grads

        losses, ll1s, radii, vis, ovfs, grads = jax.vmap(
            one_camera, in_axes=(0, 0, 0)
        )(camera_b, gt_b, tap_b)
        # mean over the local batch, then over the mesh axis
        param_grads = jax.tree.map(lambda g: jnp.mean(g, axis=0), grads[0])
        tap_grads = grads[1]  # (Bl, C, 3) — per-view screen-space grads
        param_grads = jax.lax.pmean(param_grads, axis)
        loss = jax.lax.pmean(jnp.mean(losses), axis)
        ll1 = jax.lax.pmean(jnp.mean(ll1s), axis)
        # densification stats: accumulate per view, then sum across devices
        gnorm = jnp.linalg.norm(tap_grads[..., :2], axis=-1)  # (Bl, C)
        accum = jnp.sum(jnp.where(vis, gnorm, 0.0), axis=0)
        denom = jnp.sum(vis, axis=0).astype(jnp.float32)
        maxrad = jnp.max(
            jnp.where(vis, radii.astype(jnp.float32), 0.0), axis=0
        )
        accum = jax.lax.psum(accum, axis)
        denom = jax.lax.psum(denom, axis)
        maxrad = jax.lax.pmax(maxrad, axis)
        overflow = jax.lax.pmax(jnp.max(ovfs), axis)
        return param_grads, loss, ll1, accum, denom, maxrad, overflow

    sharded = jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(), P(), P(axis), P(axis), P(), P(axis)),
        out_specs=(P(), P(), P(), P(), P(), P(), P()),
        # the compositing scan's carry init is unvarying while its xs vary
        # over the data axis; skip the vma strictness check (collectives
        # here are explicit pmean/psum).
        check_vma=False,
    )

    @jax.jit
    def step(state: TrainState, cam_batch: Camera, gt_batch, bg, lrs):
        pool = state.pool
        params = pool.params()
        b = gt_batch.shape[0]
        tap_b = jnp.zeros((b, pool.capacity, 3), jnp.float32)
        param_grads, loss, ll1, accum, denom, maxrad, overflow = sharded(
            params, pool.alive, cam_batch, gt_batch, bg, tap_b
        )
        # non-finite gradient guard (see train/loop.py train_step)
        nonfinite = sum(
            jnp.sum(~jnp.isfinite(g)) for g in jax.tree.leaves(param_grads)
        )
        param_grads = jax.tree.map(
            lambda g: jnp.where(jnp.isfinite(g), g, 0.0), param_grads
        )
        if freeze_xyz:
            param_grads = {
                **param_grads, "xyz": jnp.zeros_like(param_grads["xyz"])
            }
        if apply_update:
            new_params, new_adam = adam_update(
                params, param_grads, state.adam, lrs, update_mask=pool.alive
            )
        else:
            new_params, new_adam = params, state.adam
        new_stats = DensifyStats(
            xyz_gradient_accum=state.stats.xyz_gradient_accum + accum[:, None],
            denom=state.stats.denom + denom[:, None],
            max_radii2d=jnp.maximum(state.stats.max_radii2d, maxrad),
        )
        new_state = TrainState(
            pool=pool.with_params(new_params), adam=new_adam, stats=new_stats
        )
        return new_state, {"loss": loss, "l1": ll1, "overflow": overflow,
                           "nonfinite_grads": nonfinite}

    return step


class _InputBundle:
    """Adapter: raw param dict -> activated GaussianInputs (pool semantics
    without constructing a full GaussianPool inside shard_map)."""

    def __init__(self, params, alive, sh_degree):
        self.params = params
        self.alive = alive
        self.sh_degree = sh_degree

    def render_inputs(self):
        from sgs_tpu.core import transforms
        from sgs_tpu.render.pipeline import GaussianInputs

        p = self.params
        return GaussianInputs(
            means3d=p["xyz"],
            opacities=jax.nn.sigmoid(p["opacity"]),
            scales=jnp.exp(p["scaling"]),
            rotations=transforms.normalize(p["rotation"], eps=1e-12),
            shs=jnp.concatenate([p["features_dc"], p["features_rest"]], axis=1),
            sh_degree=self.sh_degree,
            alive=self.alive,
        )


def replicate_state(state: TrainState, mesh: Mesh) -> TrainState:
    """Place the train state fully-replicated on the mesh."""
    rep = NamedSharding(mesh, P())
    return jax.device_put(state, rep)


def shard_camera_batch(cam_batch: Camera, gt_batch, mesh: Mesh, axis: str = "data"):
    """Place a stacked camera batch + GT images sharded over the data axis."""
    sharded = NamedSharding(mesh, P(axis))
    cam = jax.tree.map(lambda x: jax.device_put(x, sharded), cam_batch)
    gt = jax.device_put(gt_batch, sharded)
    return cam, gt
