"""Model zoo: MLP/LeNet/WideResNet/ResNet/MobileNet/VGG families."""

from rigl_tpu.models.lenet import LeNet5, SmallCNN
from rigl_tpu.models.mlp import BudgetMLP, MnistMLP, width_for_param_budget
from rigl_tpu.models.mobilenet import MobileNetV1, MobileNetV2
from rigl_tpu.models.packed_convnet import (DenseConvNet,
                                            DenseResNetTwin,
                                            DenseWideResNetTwin,
                                            PackedConvNet,
                                            PackedResNet,
                                            PackedWideResNet)
from rigl_tpu.models.packed_transformer import (DenseTransformer,
                                                PackedTransformer)
from rigl_tpu.models.registry import available_models, create_model
from rigl_tpu.models.resnet import DEPTHS, ResNet, resnet
from rigl_tpu.models.vgg import VGG
from rigl_tpu.models.wide_resnet import WideResNet
