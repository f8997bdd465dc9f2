from .losses import LossModule, ValueLoss, L1Loss, MSELoss, AuralossLoss, MultiLoss
