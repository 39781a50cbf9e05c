from concept_tpu.cosmology.background import Background  # noqa: F401
from concept_tpu.cosmology.spline import Spline  # noqa: F401
