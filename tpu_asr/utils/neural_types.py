"""Lightweight neural-type contracts — rebuild of the exercised slice of
NeMo's neural-type system (N17 in SURVEY.md §2.2: tensor-axis/semantic typing
enforced at module boundaries, e.g. preprocessor IO audio_preprocessing.py:
188-212, CTC loss IO ctc.py:27-43).

Design: axis-kind tuples + element-type tags checked against array shapes and
dtypes at call boundaries. Checks read only `.shape`/`.dtype`, so they work
on jax tracers inside jit at trace time with zero runtime cost. Enforcement
is opt-in via the @typecheck decorator; set TPU_ASR_DISABLE_TYPECHECK=1 to
strip it globally.
"""

from __future__ import annotations

import enum
import functools
import inspect
import os
from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple


class AxisKind(enum.Enum):
    Batch = "B"
    Time = "T"
    Dimension = "D"
    Channel = "C"
    Any = "*"


B, T, D, C, ANY = (AxisKind.Batch, AxisKind.Time, AxisKind.Dimension,
                   AxisKind.Channel, AxisKind.Any)


class ElementType:
    """Semantic tag; subclasses form a compatibility hierarchy like NeMo's."""

    def compatible_with(self, other: "ElementType") -> bool:
        return isinstance(other, type(self)) or isinstance(self, type(other))


class AudioSignal(ElementType):
    pass


class SpectrogramType(ElementType):
    pass


class MelSpectrogramType(SpectrogramType):
    pass


class AcousticEncodedRepresentation(ElementType):
    pass


class LogprobsType(ElementType):
    pass


class LabelsType(ElementType):
    pass


class LengthsType(ElementType):
    pass


class LossType(ElementType):
    pass


@dataclass(frozen=True)
class NeuralType:
    axes: Optional[Tuple[AxisKind, ...]]     # None = scalar
    elements_type: ElementType

    def validate(self, value: Any, name: str) -> None:
        shape = getattr(value, "shape", None)
        if self.axes is None:
            if shape not in ((), None):
                raise TypeError(
                    f"{name}: expected scalar, got shape {shape}")
            return
        if shape is None:
            raise TypeError(f"{name}: expected an array with shape, got "
                            f"{type(value).__name__}")
        if len(shape) != len(self.axes):
            raise TypeError(
                f"{name}: expected rank {len(self.axes)} "
                f"({'x'.join(a.value for a in self.axes)}), got shape {shape}")


class TypecheckError(TypeError):
    pass


_DISABLED = os.environ.get("TPU_ASR_DISABLE_TYPECHECK") == "1"


def typecheck(input_types: Optional[Dict[str, NeuralType]] = None,
              output_types: Optional[Tuple[NeuralType, ...]] = None):
    """Validate named array arguments (and optionally the output tuple)
    against declared NeuralTypes at trace/call time."""

    def decorator(fn):
        if _DISABLED:
            return fn
        sig = inspect.signature(fn)

        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            if input_types:
                bound = sig.bind_partial(*args, **kwargs)
                for name, ntype in input_types.items():
                    if name in bound.arguments and \
                            bound.arguments[name] is not None:
                        ntype.validate(bound.arguments[name], name)
            out = fn(*args, **kwargs)
            if output_types:
                outs = out if isinstance(out, tuple) else (out,)
                for i, (o, ntype) in enumerate(zip(outs, output_types)):
                    ntype.validate(o, f"output[{i}]")
            return out

        return wrapper

    return decorator
