"""Common training options for tools/lazyconfig_train_net.py (analogue of
reference configs/common/train.py)."""

train = dict(
    output_dir="./output",
    init_checkpoint="",
    max_iter=90000,
    amp=dict(enabled=True),  # on TPU this selects bf16 compute dtype
    checkpointer=dict(period=5000, max_to_keep=100),
    eval_period=5000,
    log_period=20,
    device="tpu",
)
