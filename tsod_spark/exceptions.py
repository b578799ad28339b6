"""Engine error types.

Mirrors the reference's exception surface
(/root/reference/tsod/custom_exceptions.py:1-38) so a user of the
reference finds the same error names here. Unlike the reference, the
dormant exceptions (NonUniqueTimeStampsError, WrongInputSizeError) are
actually raised by our validators.
"""


class AnomalyDetectionError(Exception):
    """Base class for all tsod_spark errors."""


class WrongInputDataTypeError(AnomalyDetectionError):
    def __init__(self, message="Input data must be a pyspark DataFrame or TimeSeriesFrame."):
        super().__init__(message)


class NotFittedError(AnomalyDetectionError):
    def __init__(self, method_name=""):
        super().__init__(
            f"This detector is not fitted yet. Call 'fit' before calling '{method_name}'."
        )


class NoRangeDefinedError(AnomalyDetectionError):
    def __init__(self, message="No range defined. Fit the detector or set min/max."):
        super().__init__(message)


class InvalidArgumentError(AnomalyDetectionError):
    def __init__(self, argument_name, requirement):
        super().__init__(f"Argument '{argument_name}' must be {requirement}.")


class NotIntegerError(InvalidArgumentError):
    def __init__(self, argument_name):
        super().__init__(argument_name, "an integer")


class NonUniqueTimeStampsError(AnomalyDetectionError):
    def __init__(self, message="Found multiple rows with the same (series, timestamp)."):
        super().__init__(message)


class NonMonotonicTimeStampsError(AnomalyDetectionError):
    def __init__(self, message="Index must be monotonically increasing"):
        # message text matches /root/reference/tsod/base.py:87
        super().__init__(message)


class WrongInputSizeError(AnomalyDetectionError):
    def __init__(self, message="Input data has the wrong size."):
        super().__init__(message)
