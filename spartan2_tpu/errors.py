"""Error types (reference: src/errors.rs SpartanError)."""


class SpartanError(Exception):
    """Any proving/verification failure."""


class UnSatError(SpartanError):
    """R1CS instance-witness pair does not satisfy the shape."""


class ProofVerifyError(SpartanError):
    """Proof failed verification."""
