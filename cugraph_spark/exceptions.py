"""Exception classes (reference parity: ``cugraph/exceptions.py:19-26``).

``FailedToConvergeError`` subclasses ``RuntimeError`` (the reference uses
bare ``Exception``) so existing callers that catch ``RuntimeError`` on
nonconvergent iterative runs keep working.
"""


class FailedToConvergeError(RuntimeError):
    """Raised when an algorithm fails to converge within a predetermined set
    of constraints which vary based on the algorithm, and may or may not be
    user-configurable."""
