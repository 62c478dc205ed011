"""Typed config system mirroring the reference's ParamGroup flags.

Field names, defaults and one-letter shorthands match
/root/reference/arguments/__init__.py:47-95 so existing command lines
transfer. Implemented as dataclasses introspected into argparse (the
idiomatic replacement for the reference's attribute-scraping ParamGroup),
plus the cfg_args persist/merge round trip used by render-time tools
(get_combined_args, arguments/__init__.py:97-117).
"""

from __future__ import annotations

import os
from argparse import ArgumentParser, BooleanOptionalAction, Namespace
from dataclasses import dataclass, field, fields


@dataclass
class ModelParams:
    sh_degree: int = 3
    source_path: str = ""  # shorthand -s
    model_path: str = ""  # shorthand -m
    images: str = "images"  # shorthand -i
    resolution: int = -1  # shorthand -r
    white_background: bool = False  # shorthand -w
    decimate_factor: float = 1.0
    mesh_max_faces: int = 16_000
    obj_path: str = ""
    data_device: str = "tpu"  # accepted for CLI compat; placement is XLA's
    eval: bool = True
    freeze_xyz: bool = False

    _shorthands = {
        "source_path": "-s",
        "model_path": "-m",
        "images": "-i",
        "resolution": "-r",
        "white_background": "-w",
    }


@dataclass
class PipelineParams:
    # convert_SHs_python / compute_cov3D_python were the reference's
    # PyTorch-vs-CUDA numerical cross-check escape hatches
    # (gaussian_renderer/__init__.py:62-78). Here ALL math is JAX, so they
    # are accepted no-ops; the cross-check role is played by
    # rasterizer="reference" (the pure-jnp oracle the tiled/Pallas paths
    # are tested against to allclose).
    convert_SHs_python: bool = False
    compute_cov3D_python: bool = False
    no_tqdm: bool = False
    debug: bool = False
    # TPU-framework extensions: rasterizer selection
    rasterizer: str = "tiled"  # "tiled" (production) | "reference" (oracle)
    raster_backend: str = "auto"  # "auto" | "xla" | "pallas" forward
    # kernel; "auto" = pallas on TPU, xla elsewhere (resolve_raster_backend)
    # multi-chip training: "none" | "dp" (camera-batch data parallelism
    # over all visible devices; batch size = device count) | "hybrid"
    # (2D camera-DP x Gaussian-shard mesh; see parallel/hybrid.py)
    parallel: str = "none"
    # hybrid mesh shape "DxG" (data x gauss), e.g. "2x4"; empty = one
    # data row over all local devices (make_hybrid_mesh default)
    parallel_mesh: str = ""
    # hybrid mode: split band boundaries by cumulative splat load instead
    # of equal height (parallel/tile_shard.balanced_band_offsets) —
    # front-loaded scenes stop idling the chips that own empty bands
    hy_balance: bool = False
    # hybrid mode: compact each band's gathered records to the
    # ownership-culled subset before binning (parallel/hybrid.py
    # _band_compact) — the N-scale expansion then runs at ~N/n_bands
    # per band instead of full N. On by default; disable to A/B.
    hy_compact: bool = True
    # tight (exact ellipse/tile) binning for the Pallas backend: culls
    # (Gaussian, tile) pairs whose alpha is < 1/255 everywhere in the
    # tile — identical images up to f32 summation order, ~35% fewer
    # instances (render/tiled.py:_x_tile_interval)
    tight_culling: bool = True

    _shorthands: dict = field(default_factory=dict)


@dataclass
class OptimizationParams:
    iterations: int = 90_000
    position_lr_init: float = 0.00016
    position_lr_final: float = 0.0000016
    position_lr_delay_mult: float = 0.01
    position_lr_max_steps: int = 30_000
    feature_lr: float = 0.0025
    opacity_lr: float = 0.05
    scaling_lr: float = 0.005
    rotation_lr: float = 0.001
    percent_dense: float = 0.01
    lambda_dssim: float = 0.2
    densification_interval: int = 100
    opacity_reset_interval: int = 3000
    densify_from_iter: int = 500
    densify_until_iter: int = 15_000
    densify_grad_threshold: float = 0.0002
    random_background: bool = False

    _shorthands: dict = field(default_factory=dict)


def add_dataclass_args(
    parser: ArgumentParser, cls, prefix_group: str, sentinel: bool = False
) -> None:
    """sentinel=True mirrors the reference's ModelParams(parser,
    sentinel=True) (arguments/__init__.py:30-46): every default becomes
    None so values persisted in cfg_args survive the get_combined_args
    merge unless the flag is explicitly passed on the command line.

    Bools register as --flag/--no-flag (BooleanOptionalAction) rather
    than the reference's store_true: with store_true a bool persisted as
    True in cfg_args (e.g. eval, white_background) could never be
    overridden to False at render time, and a True-default bool could
    never be disabled at all (ADVICE r4). Positive flags and shorthands
    (-w) behave exactly as before; --no-<flag> is additive."""
    group = parser.add_argument_group(prefix_group)
    shorthands = getattr(cls, "_shorthands", {}) or {}
    if not isinstance(shorthands, dict):
        shorthands = {}
    for f in fields(cls):
        if f.name.startswith("_"):
            continue
        flag = "--" + f.name
        names = [flag]
        if f.name in shorthands:
            names.append(shorthands[f.name])
        default = None if sentinel else f.default
        if f.type in (bool, "bool"):
            group.add_argument(
                *names, default=default, action=BooleanOptionalAction
            )
        else:
            t = {"int": int, "float": float, "str": str}.get(f.type, f.type)
            if isinstance(t, str):
                t = str
            group.add_argument(*names, default=default, type=t)


def extract_dataclass(cls, args: Namespace):
    # None means "not specified" (sentinel parsers / cfg_args merge) and
    # falls back to the dataclass default. This is only sound while no
    # dataclass field has a None DEFAULT with distinct meaning —
    # tests/test_eval_tools.py::test_no_none_dataclass_defaults pins that
    # invariant (ADVICE r4).
    kwargs = {
        f.name: getattr(args, f.name)
        for f in fields(cls)
        if not f.name.startswith("_")
        and getattr(args, f.name, None) is not None
    }
    obj = cls(**kwargs)
    if isinstance(obj, ModelParams) and obj.source_path:
        obj.source_path = os.path.abspath(obj.source_path)
    return obj


def save_cfg_args(model_path: str, model_params: ModelParams) -> None:
    """Persist the Namespace literal the reference writes (train.py:160-164)
    so render/metrics tools can merge it back."""
    os.makedirs(model_path, exist_ok=True)
    ns = Namespace(
        **{
            f.name: getattr(model_params, f.name)
            for f in fields(ModelParams)
            if not f.name.startswith("_")
        }
    )
    with open(os.path.join(model_path, "cfg_args"), "w") as f:
        f.write(str(ns))


def get_combined_args(parser: ArgumentParser, argv=None) -> Namespace:
    """CLI over persisted cfg_args (arguments/__init__.py:97-117), without
    the reference's eval() of the config file."""
    args_cmdline = parser.parse_args(argv)
    merged = {}
    cfgfile = os.path.join(args_cmdline.model_path or "", "cfg_args")
    if args_cmdline.model_path and os.path.exists(cfgfile):
        with open(cfgfile) as f:
            text = f.read().strip()
        merged.update(_parse_namespace_literal(text))
    for k, v in vars(args_cmdline).items():
        if v is not None:
            merged[k] = v
    return Namespace(**merged)


def _parse_namespace_literal(text: str) -> dict:
    """Parse \"Namespace(a=1, b='x')\" without eval."""
    import ast

    if not text.startswith("Namespace(") or not text.endswith(")"):
        return {}
    inner = text[len("Namespace(") : -1]
    try:
        call = ast.parse(f"f({inner})", mode="eval").body
        return {kw.arg: ast.literal_eval(kw.value) for kw in call.keywords}
    except (SyntaxError, ValueError):
        return {}


def resolve_raster_backend(backend: str) -> str:
    """"auto" -> the production Pallas kernels on a real accelerator,
    the XLA scan compositor on CPU (where Pallas runs in slow interpret
    mode; tests pick explicitly)."""
    if backend != "auto":
        return backend
    import jax

    return "xla" if jax.default_backend() == "cpu" else "pallas"
