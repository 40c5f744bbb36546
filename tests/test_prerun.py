"""Pre-run training-data validation gate (reference
`unit_tests/test_prerun.py:22-55` + conftest `--yaml-path` option):
`pytest -m prerun --yaml-path=data.yaml` validates the YAML before
training. The trainer calls `verify_yaml` directly (library form), but the
pytest-marked form is preserved as a public interface."""

import pytest

from otter_tpu.data.yaml_spec import load_yaml, validate_spec


@pytest.mark.prerun
def test_training_data_yaml(yaml_path):
    if not yaml_path:
        pytest.skip("pass --yaml-path=<data.yaml> to run the prerun gate")
    problems = validate_spec(load_yaml(yaml_path))
    assert not problems, "data YAML validation failed:\n" + "\n".join(
        problems)
