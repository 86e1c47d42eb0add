from fbs_tpu.applications.image_restore import RestorationSampler
from fbs_tpu.applications.gp_toy import GPRegressionToy
from fbs_tpu.applications.gaussian_sb import GaussianSBToy
from fbs_tpu.applications.training import (
    train_score_model, DSBTrainer, make_lr_schedule, make_optimiser,
)
