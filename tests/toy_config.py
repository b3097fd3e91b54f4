"""Shared tiny flat EMA-VQ-VAE config for distributed tests.

Same architecture-key contract as the reference YAMLs
(reference: egs/vcc20/vae1/conf/train_pytorch_vqvae.yaml), shrunk to
CPU-test scale. Feature dim 10, 3 speakers.
"""


def toy_config():
    return {
        "model_type": "vae_npvc.model.vqvae",
        "seed": 7,
        "y_dim": 8, "y_num": 3, "z_dim": 8, "z_num": 16,
        "use_ema": True, "beta": 0.01, "mu": 0.9, "jitter_p": 0.0,
        "optim_type": "Adam", "learning_rate": 1e-3, "max_grad_norm": 10,
        "use_pallas_vq": False, "use_native_loader": False,
        "encoder": {"in_channels": [10], "out_channels": [12],
                    "kernel_size": 3, "downsample_scales": [1],
                    "z_channels": 8, "dilation": False,
                    "stack_kernel_size": 3, "stack_layers": 1, "stacks": [1],
                    "use_weight_norm": True},
        "decoder": {"in_channels": [8], "out_channels": [12],
                    "cond_channels": 8, "skip_channels": 8,
                    "final_channels": 10, "kernel_size": 3,
                    "upsample_scales": [1], "dilation": False,
                    "stack_kernel_size": 3, "stacks": [1],
                    "use_weight_norm": True},
    }
