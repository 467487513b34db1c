"""Neural types: semantic tensor typing with call-time validation.

Reference parity: `nemo/core/neural_types/` (NeuralType = axes × element
type with comparison semantics) and the `@typecheck` decorator
(`core/classes/common.py:1011`) validating declared `input_types` /
`output_types` on every call.

TPU-native stance: validation happens at TRACE time — under `jit` shapes
and dtypes are static, so the checks run once per compilation and cost
nothing per step. Axis dims may be symbolic (None = any); element types
form a small subsumption lattice (VoidType accepts anything, element
comparison follows the subclass chain) mirroring the reference's
`NeuralTypeComparisonResult.SAME/LESS` semantics.
"""

from __future__ import annotations

import enum
import functools
import inspect
from dataclasses import dataclass
from typing import Any, Dict, Optional, Sequence, Tuple


class NeuralTypeComparisonResult(enum.Enum):
    SAME = 0
    LESS = 1  # A is a subtype of B
    GREATER = 2
    INCOMPATIBLE = 3


class ElementType:
    """Base semantic element type (reference elements.py)."""

    dtypes: Optional[Tuple[str, ...]] = None  # accepted dtype names, None=any

    def compare(self, other: "ElementType") -> NeuralTypeComparisonResult:
        if type(self) is type(other):
            return NeuralTypeComparisonResult.SAME
        if isinstance(self, type(other)):
            return NeuralTypeComparisonResult.LESS
        if isinstance(other, type(self)):
            return NeuralTypeComparisonResult.GREATER
        return NeuralTypeComparisonResult.INCOMPATIBLE


class VoidType(ElementType):
    def compare(self, other):
        return NeuralTypeComparisonResult.SAME


class AudioSignal(ElementType):
    dtypes = ("float32", "bfloat16", "int16")


class SpectrogramType(ElementType):
    dtypes = ("float32", "bfloat16")


class MelSpectrogramType(SpectrogramType):
    pass


class EncodedRepresentation(ElementType):
    pass


class LogprobsType(ElementType):
    dtypes = ("float32", "bfloat16")


class LogitsType(ElementType):
    dtypes = ("float32", "bfloat16")


class LabelsType(ElementType):
    dtypes = ("int32", "int64")


class TokenIndex(LabelsType):
    pass


class LengthsType(ElementType):
    dtypes = ("int32", "int64")


class MaskType(ElementType):
    dtypes = ("bool", "int32", "float32")


class ProbsType(ElementType):
    dtypes = ("float32", "bfloat16")


class LossType(ElementType):
    dtypes = ("float32",)


@dataclass(frozen=True)
class AxisType:
    kind: str  # 'B' batch | 'T' time | 'D' dim | 'C' channel | any label
    size: Optional[int] = None  # None = any


class NeuralType:
    """axes (tuple of AxisType/str/None) × element type."""

    def __init__(self, axes: Optional[Sequence] = None,
                 elements_type: Optional[ElementType] = None):
        self.elements_type = elements_type or VoidType()
        if axes is None:
            self.axes = None  # any rank
        else:
            self.axes = tuple(
                a if isinstance(a, AxisType) else AxisType(str(a))
                for a in axes)

    def compare(self, other: "NeuralType") -> NeuralTypeComparisonResult:
        ec = self.elements_type.compare(other.elements_type)
        if ec == NeuralTypeComparisonResult.INCOMPATIBLE:
            return ec
        if self.axes is None or other.axes is None:
            return ec
        if len(self.axes) != len(other.axes):
            return NeuralTypeComparisonResult.INCOMPATIBLE
        for a, b in zip(self.axes, other.axes):
            if a.size is not None and b.size is not None and a.size != b.size:
                return NeuralTypeComparisonResult.INCOMPATIBLE
        return ec

    def validate(self, value: Any, name: str = "arg") -> None:
        """Trace-time check: rank, fixed axis sizes, dtype family."""
        shape = getattr(value, "shape", None)
        if shape is None:
            raise TypeError(f"{name}: expected an array, got {type(value)}")
        if self.axes is not None:
            if len(shape) != len(self.axes):
                raise TypeError(
                    f"{name}: rank {len(shape)} != declared {len(self.axes)} "
                    f"({[a.kind for a in self.axes]})")
            for i, ax in enumerate(self.axes):
                if ax.size is not None and shape[i] != ax.size:
                    raise TypeError(
                        f"{name}: axis {i} ({ax.kind}) has size {shape[i]}, "
                        f"declared {ax.size}")
        allowed = self.elements_type.dtypes
        if allowed is not None:
            dt = str(getattr(value, "dtype", ""))
            if dt not in allowed:
                raise TypeError(
                    f"{name}: dtype {dt} not in {allowed} for "
                    f"{type(self.elements_type).__name__}")

    def __repr__(self):
        ax = None if self.axes is None else tuple(a.kind for a in self.axes)
        return f"NeuralType(axes={ax}, {type(self.elements_type).__name__})"


def typecheck(fn=None):
    """Validate call args against the owner's `input_types` and the result
    against `output_types` (reference common.py:1011). Types are looked up
    on the bound object; positional args map by signature order."""

    def deco(f):
        sig = inspect.signature(f)
        names = [n for n in sig.parameters if n != "self"]

        @functools.wraps(f)
        def wrapper(self, *args, **kwargs):
            in_types: Dict[str, NeuralType] = getattr(self, "input_types", None) or {}
            bound = sig.bind(self, *args, **kwargs)
            for pname, ptype in in_types.items():
                if pname in bound.arguments:
                    ptype.validate(bound.arguments[pname], pname)
            out = f(self, *args, **kwargs)
            out_types: Dict[str, NeuralType] = getattr(self, "output_types", None) or {}
            if out_types:
                if isinstance(out, dict):  # match dict outputs by key
                    for oname, otype in out_types.items():
                        if oname in out:
                            otype.validate(out[oname], oname)
                else:
                    vals = out if isinstance(out, tuple) else (out,)
                    for (oname, otype), v in zip(out_types.items(), vals):
                        otype.validate(v, oname)
            return out

        return wrapper

    return deco(fn) if fn is not None else deco
