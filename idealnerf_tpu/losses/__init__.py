from idealnerf_tpu.losses.landmark import (
    landmark_features, landmark_feature_loss, heatmap_landmark_loss, LandmarkLoss,
)
from idealnerf_tpu.losses.perceptual import FeatureLoss, gram_matrix, make_vgg16_features
from idealnerf_tpu.utils.metrics import img2mse, mse2psnr
