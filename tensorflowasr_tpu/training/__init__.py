from tensorflowasr_tpu.training.trainer import TrainState, Trainer, make_eval_step, make_train_step
