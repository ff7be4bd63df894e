# Resumable single-host runs with frequent internal checkpoints
# (mirrors the reference train_distributed_with_checkpoints.sh intent).
python train_with_gradient_descent.py name=fbaug_gradreg_lr08 hyp=gradreg \
    impl.checkpoint.name=fbaug_gradreg_lr08.ckpt impl.checkpoint.save_every_nth_step=10
