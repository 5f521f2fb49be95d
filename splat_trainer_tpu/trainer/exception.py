"""Abort-training exception taxonomy
(reference /root/reference/splat_trainer/trainer/exception.py:1-26)."""


class TrainingException(Exception):
    """Unrecoverable training problem (e.g. a render with no visible points)."""


class NaNParameterException(TrainingException):
    """Non-finite entries detected in the scene state at checkpoint time."""


class NoProgressException(TrainingException):
    """Training SSIM regressed below the configured tolerance."""


class TrainingTimeoutException(TrainingException):
    """Running-mean step rate dropped below min_step_rate."""
