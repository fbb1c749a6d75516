"""Object registry + spec system — the framework's configuration substrate.

Replaces the reference's obj_factory (hyperseg/utils/obj_factory.py), which
builds objects from strings like "optim.Adam(lr=1e-3)" by `eval`-ing the
argument list (obj_factory.py:64). Here specs are parsed with `ast` and only
Python literals are allowed as arguments — declarative, no code execution.

A spec is one of:
  * a callable                      -> returned as-is (wrapped if partial args)
  * a Spec(target, args, kwargs)    -> explicit form
  * a string "pkg.mod.fn(a, b=c)"   -> parsed; target resolved by import or
                                       through KNOWN_ALIASES short names
Reference-compatible aliases are provided so that arch strings stored in
reference checkpoints ("hyperseg.models.hyperseg_v1_0.hyperseg_efficientnet(...)")
resolve to this framework's equivalents.
"""

from __future__ import annotations

import ast
import importlib
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, Optional, Tuple


# Short-name aliases (the KNOWN_MODULES idea, obj_factory.py:6-28) plus a
# remap of reference module paths onto this package.
KNOWN_ALIASES: Dict[str, str] = {
    "hyperseg_v0_1": "hyperseg_tpu.models.hyperseg_v0_1",
    "hyperseg_v0_2": "hyperseg_tpu.models.hyperseg_v0_2",
    "hyperseg_v1_0": "hyperseg_tpu.models.hyperseg_v1_0",
    "hyperseg_v1_0_unify": "hyperseg_tpu.models.hyperseg_v1_0_unify",
    "efficientnet": "hyperseg_tpu.models.backbones.efficientnet",
    "seg_transforms": "hyperseg_tpu.data.seg_transforms",
    "cityscapes": "hyperseg_tpu.data.cityscapes",
    "camvid": "hyperseg_tpu.data.camvid",
    "voc_sbd": "hyperseg_tpu.data.voc_sbd",
    "losses": "hyperseg_tpu.train.losses",
    "schedule": "hyperseg_tpu.train.schedule",
    # reference-path remap (checkpoint arch strings)
    "hyperseg.models.hyperseg_v0_1": "hyperseg_tpu.models.hyperseg_v0_1",
    "hyperseg.models.hyperseg_v0_2": "hyperseg_tpu.models.hyperseg_v0_2",
    "hyperseg.models.hyperseg_v1_0": "hyperseg_tpu.models.hyperseg_v1_0",
    "hyperseg.models.hyperseg_v1_0_unify": "hyperseg_tpu.models.hyperseg_v1_0_unify",
    "hyperseg.models.backbones.efficientnet": "hyperseg_tpu.models.backbones.efficientnet",
    "hyperseg.datasets.cityscapes": "hyperseg_tpu.data.cityscapes",
    "hyperseg.datasets.camvid": "hyperseg_tpu.data.camvid",
    "hyperseg.datasets.voc_sbd": "hyperseg_tpu.data.voc_sbd",
    "hyperseg.datasets.seg_transforms": "hyperseg_tpu.data.seg_transforms",
    "hyperseg.losses.bootstrapped_ce_loss": "hyperseg_tpu.train.losses",
}


def resolve_target(path: str) -> Callable:
    """Resolve 'pkg.mod.attr' (or an aliased prefix) to a callable."""
    if "." not in path:
        raise ValueError(f"target {path!r} must be a dotted path")
    mod_path, attr = path.rsplit(".", 1)
    mod_path = KNOWN_ALIASES.get(mod_path, mod_path)
    module = importlib.import_module(mod_path)
    if not hasattr(module, attr):
        raise AttributeError(f"{mod_path} has no attribute {attr!r}")
    return getattr(module, attr)


def _literal(node: ast.expr):
    try:
        return ast.literal_eval(node)
    except (ValueError, SyntaxError) as e:
        raise ValueError(
            f"spec arguments must be Python literals, got {ast.dump(node)}") from e


@dataclass
class Spec:
    """A deferred, declarative object construction."""
    target: str
    args: Tuple = ()
    kwargs: Dict[str, Any] = field(default_factory=dict)

    def build(self, *extra_args, **extra_kwargs):
        fn = resolve_target(self.target)
        kw = {**self.kwargs, **extra_kwargs}
        return fn(*self.args, *extra_args, **kw)

    def with_overrides(self, **kw) -> "Spec":
        return Spec(self.target, self.args, {**self.kwargs, **kw})

    def to_string(self) -> str:
        parts = [repr(a) for a in self.args]
        parts += [f"{k}={v!r}" for k, v in self.kwargs.items()]
        return f"{self.target}({','.join(parts)})"


def parse_spec(text: str) -> Spec:
    """Parse "pkg.mod.fn(1, k=[2, 3])" into a Spec. Literal arguments only."""
    text = text.strip()
    tree = ast.parse(text, mode="eval").body
    if isinstance(tree, ast.Call):
        if not isinstance(tree.func, (ast.Attribute, ast.Name)):
            raise ValueError(f"unsupported spec callee in {text!r}")
        target = ast.unparse(tree.func)
        args = tuple(_literal(a) for a in tree.args)
        kwargs = {kw.arg: _literal(kw.value) for kw in tree.keywords}
        return Spec(target, args, kwargs)
    if isinstance(tree, (ast.Attribute, ast.Name)):
        return Spec(ast.unparse(tree))
    raise ValueError(f"cannot parse spec {text!r}")


def build(spec, *args, **kwargs):
    """Materialize any spec form (string | Spec | callable)."""
    if spec is None:
        return None
    if isinstance(spec, str):
        spec = parse_spec(spec)
    if isinstance(spec, Spec):
        return spec.build(*args, **kwargs)
    if callable(spec):
        return spec(*args, **kwargs)
    raise TypeError(f"cannot build object from {type(spec)}")


def spec_of(obj) -> Optional[Spec]:
    """Best-effort Spec extraction (for arch serialization): accepts Spec,
    string, or functools.partial of a module-level callable with literal args."""
    import functools

    if isinstance(obj, Spec):
        return obj
    if isinstance(obj, str):
        return parse_spec(obj)
    if isinstance(obj, functools.partial):
        fn = obj.func
        target = f"{fn.__module__}.{fn.__qualname__}"
        return Spec(target, tuple(obj.args), dict(obj.keywords))
    if callable(obj):
        return Spec(f"{obj.__module__}.{obj.__qualname__}")
    return None
