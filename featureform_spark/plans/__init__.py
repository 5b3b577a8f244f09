from featureform_spark.plans.templates import substitute_template, template_refs
from featureform_spark.plans.engine import Engine

__all__ = ["substitute_template", "template_refs", "Engine"]
