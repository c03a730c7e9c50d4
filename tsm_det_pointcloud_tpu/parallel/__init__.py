from .train_state import TrainState, create_train_step, make_mesh, shard_batch
