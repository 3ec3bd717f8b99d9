"""Named filter pipelines (the framework's "model" families)."""

from hipe_tpu.models.pipelines import PIPELINES, Pipeline, flagship  # noqa: F401
