from crdmodel_tpu.models.base import ReactionModel, get_model, register_model
from crdmodel_tpu.models import (  # noqa: F401  (registers models)
    aliev_panfilov, barkley, brusselator, fhn, goldbeter, grayscott,
    lambdaomega, oregonator, sir)

__all__ = ["ReactionModel", "get_model", "register_model"]
