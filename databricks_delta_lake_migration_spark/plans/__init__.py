"""Pipeline plans (medallion bronze→silver→gold runner)."""

from .medallion import MedallionPipeline  # noqa: F401
