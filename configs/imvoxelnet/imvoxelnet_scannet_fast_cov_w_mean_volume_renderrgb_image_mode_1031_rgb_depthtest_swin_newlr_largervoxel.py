# Generated from the reference config of the same name
# (values verbatim; see _base_fast_cov.py for the family note).
_base_ = ['./_base_fast_cov.py']

model = {'backbone': {'type': 'SwinTransformer',
              'pretrain_img_size': 224,
              'embed_dims': 96,
              'patch_size': 4,
              'window_size': 7,
              'mlp_ratio': 4,
              'depths': [2, 2, 6, 2],
              'num_heads': [3, 6, 12, 24],
              'strides': (4, 2, 2, 2),
              'out_indices': (0, 1, 2, 3),
              'qkv_bias': True,
              'qk_scale': None,
              'patch_norm': True,
              'drop_rate': 0.0,
              'attn_drop_rate': 0.0,
              'drop_path_rate': 0.2,
              'use_abs_pos_embed': False,
              'norm_cfg': {'type': 'LN', 'requires_grad': True},
              'pretrain_style': 'official',
              'output_missing_index_as_none': False,
              '_delete_': True},
 'neck': {'type': 'FPN',
          'in_channels': [96, 192, 384, 768],
          'out_channels': 256,
          'num_outs': 4},
 'pretrained': 'https://github.com/SwinTransformer/storage/releases/download/v1.0.0/swin_tiny_patch4_window7_224.pth',
 'voxel_size': (0.16, 0.16, 0.2),
 'n_voxels': (56, 56, 16),
 'N_rand': 1024,
 'nerf_sample_view': 10}

train_pipeline_overrides = {'n_images': 20}

data = dict(train=dict(times=12))

lr_config = {'policy': 'cyclic',
 'target_ratio': (5, 0.0001),
 'cyclic_times': 1,
 'step_ratio_up': 0.4}

optimizer = {'type': 'AdamW', 'lr': 0.0002, 'weight_decay': 0.0001}
