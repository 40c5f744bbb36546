from otter_tpu.benchmarks.models.otter_image import OtterVideo  # noqa: F401
