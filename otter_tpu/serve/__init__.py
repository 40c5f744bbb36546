from otter_tpu.serve.controller import Controller, DispatchMethod
from otter_tpu.serve.conversation import (Conversation, conv_templates,
                                          default_conversation)
from otter_tpu.serve.worker import ModelWorker, decode_images_to_vision_x
