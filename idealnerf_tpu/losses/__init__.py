from idealnerf_tpu.losses.landmark import (
    landmark_features, landmark_feature_loss, heatmap_landmark_loss, LandmarkLoss,
)
from idealnerf_tpu.losses.perceptual import FeatureLoss, gram_matrix, make_vgg16_features
from idealnerf_tpu.losses.vgg import (
    init_vgg16, init_vggface, load_vggface, make_vgg16_loss,
    make_vggface_loss, vgg16_features, vgg16_params_from_torch,
    vggface_features, vggface_params_from_torch,
)
from idealnerf_tpu.utils.metrics import img2mse, mse2psnr
