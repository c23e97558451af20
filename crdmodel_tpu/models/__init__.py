from crdmodel_tpu.models.base import ReactionModel, get_model, register_model
from crdmodel_tpu.models import fhn, goldbeter, barkley, grayscott  # noqa: F401  (registers models)

__all__ = ["ReactionModel", "get_model", "register_model"]
