# Multi-host launch recipes (larger models).
#
# One process per HOST (not per chip): JAX owns all local devices. On a TPU
# pod slice, simply launch the same command on every host; jax.distributed
# initializes from the TPU metadata automatically. On GPU/CPU clusters pass
# the coordinator explicitly via impl.setup.{url,world_size,rank}.

python train_with_gradient_descent.py name=fbaug_gradreg_lr08_resnet152 hyp=gradreg model=resnet152 \
    impl/setup=distributed impl.checkpoint.name=fbaug_gradreg_lr08_resnet152.ckpt

python train_with_gradient_descent.py name=fbaug_highreg_lr08_shuffle_resnet152 hyp=gradreg data.batch_size=32 \
    hyp.shuffle=True model=resnet152 impl/setup=distributed \
    impl.checkpoint.name=fbaug_highreg_lr08_shuffle_resnet152.ckpt

python train_with_gradient_descent.py name=fbaug_gradreg_lr08_densenet121 hyp=gradreg model=densenet121 \
    impl/setup=distributed impl.checkpoint.name=fbaug_gradreg_lr08_densenet121.ckpt
