"""Engine errors mirroring the reference's runtime error surface.

The reference fails with ``error "..."`` strings at well-defined points
(e.g. "no such field", Combinator.hs:199/206-209; "inconsistent type",
Combinator.hs:131/163/181; "Can't join inconsistent data frames",
Combinator.hs:341; "Invalid data (possibly missing values)",
DataFrame.hs:237-238).  We raise typed exceptions carrying the same
messages so parity tests can assert on them.
"""


class KevinError(Exception):
    """Base class for engine errors."""


class KevinTypeError(KevinError, TypeError):
    """'inconsistent type' / 'invalid type' / 'invalid field name'."""


class KevinFieldError(KevinError, KeyError):
    """'no such field'."""

    def __str__(self) -> str:  # KeyError quotes its arg; keep message clean
        return self.args[0] if self.args else ""


class KevinValueError(KevinError, ValueError):
    """Invalid data / invalid combinator arguments."""


class KevinPivotError(KevinError, RuntimeError):
    """'not in pivot form' / 'unable to stack' / pivot invariant violations."""
