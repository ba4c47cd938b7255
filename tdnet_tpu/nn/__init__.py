from tdnet_tpu.nn.module import Ctx, eval_ctx
from tdnet_tpu.nn.resnet import (BACKBONES, ResNetConfig, apply_resnet,
                                 init_resnet, resnet18, resnet34, resnet50,
                                 resnet101)
from tdnet_tpu.nn.pyramid import (apply_psp_head, apply_pyramid_pooling,
                                  apply_pyramid_pooling_groups,
                                  init_psp_head, init_pyramid_pooling)
from tdnet_tpu.nn.encoding import (apply_attention, apply_encoding_cached,
                                   apply_encoding_full, init_attention,
                                   init_encoding)
from tdnet_tpu.nn.heads import (apply_fcn_head, apply_group_conv,
                                apply_pred_layer, init_fcn_head,
                                init_group_conv, init_pred_layer)
