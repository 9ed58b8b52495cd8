# Tiny CPU-runnable end-to-end config: synthetic 4-part shapes, T=5, 64 pts.
name = "tiny_gen"
work_dir = "work_dirs/tiny_gen"

cimle = True
cimle_cache_interval = 2

model = dict(
    type="AnchorDiffAE",
    encoder=dict(
        type="PartEncoderForTransformerDecoder",
        encoder=dict(type="PointNetV2", zdim=16, point_dim=3, per_part_mlp=True),
        part_aligner=dict(
            type="PartAlignerTransformer",
            in_channels=16,
            out_channels=6,
            n_class=4,
            d_head=8,
            depth=2,
            n_heads=2,
            dropout=0.0,
            use_linear=True,
            class_cond=True,
            single_attn=True,
            add_class_cond=True,
            cimle=True,
            noise_scale=10,
            cond_noise_type=0,
        ),
        n_class=4,
        kl_weight=1e-3,
        fit_loss_type=4,
        fit_loss_weight=1.0,
        use_flow=True,
        latent_flow_depth=4,
        latent_flow_hidden_dim=16,
        include_z=False,
        include_part_code=True,
        include_params=True,
        use_gt_params=False,
        gen=True,
        prior_var=1.0,
    ),
    diffusion=dict(
        type="AnchoredDiffusion",
        net=dict(
            type="TransformerNet",
            in_channels=3,
            out_channels=3,
            n_heads=2,
            d_head=8,
            depth=2,
            dropout=0.0,
            context_dim=16 + 6,
            n_class=4,
            class_cond=True,
            use_linear=True,
            cat_params_to_x=True,
            single_attn=True,
            cat_class_to_x=True,
        ),
        beta_1=1e-4,
        beta_T=0.02,
        k=1.0,
        res=False,
        mode="linear",
        use_beta=False,
        model_mean_type="epsilon",
        learn_variance=True,
        loss_type="mse",
        include_anchors=False,
    ),
    sampler=dict(type="Uniform"),
    num_anchors=4,
    num_timesteps=5,
    npoints=64,
    gen=True,
    cimle=True,
    cimle_sample_num=1,
    ret_traj=False,
    ret_interval=2,
)

dataset = dict(
    train=dict(type="SyntheticPart", batch_size=4, size=8, npoints=64, split="train", eval_mode="gen"),
    val=dict(
        type="SyntheticPart",
        batch_size=4,
        size=8,
        npoints=64,
        split="test",
        shuffle=False,
        eval_mode="gen",
    ),
)

optimizer = dict(type="Adam", lr=1e-3, weight_decay=0.0)
scheduler = dict(type="LinearLR", start_lr=1e-3, end_lr=1e-4, start_epoch=2, end_epoch=4)
logger = dict(type="RunLogger")

save_num_batch = 1
max_epoch = 2
eval_interval = 2
checkpoint_interval = 2
log_interval = 1
max_norm = 10
train_aligner = False
resume_path = None
