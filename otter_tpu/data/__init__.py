from otter_tpu.data.loader import MimicitLoader, WeightedMultiLoader
from otter_tpu.data.mimicit import (
    MimicitDataset,
    MimicitTask,
    mask_answer_labels,
    find_and_remove_tokens,
)
from otter_tpu.data.yaml_spec import (
    DataSpecError,
    load_yaml,
    tasks_from_spec,
    validate_spec,
    verify_yaml,
)
