from .icp import ICPAlgorithm, ICPRegistration, estimate_covariances, estimate_normals

__all__ = [
    "ICPAlgorithm",
    "ICPRegistration",
    "estimate_normals",
    "estimate_covariances",
]
