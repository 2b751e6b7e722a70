from . import (capture, embedding_arithmetic, grad_cam,  # noqa: F401
               integrated_gradients, occlusion, raw_attention, rollout, suite)
