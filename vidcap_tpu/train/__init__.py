from vidcap_tpu.train.state import TrainState, create_train_state  # noqa: F401
from vidcap_tpu.train.steps import make_xe_step  # noqa: F401
