"""Weighted combination of named losses.

Parity target: reference ``MultiLoss`` (losses/combine.py:23-68).
"""


class MultiLoss:
    def __init__(self, losses):
        """losses: dict name -> (weight, callable(y_hat, y))."""
        self.weights = {k: v[0] for k, v in losses.items()}
        self.losses = {k: v[1] for k, v in losses.items()}

    def __call__(self, y_hat, y, with_dict: bool = False):
        total = 0.0
        loss_dict = {}
        for name, fn in self.losses.items():
            loss_dict[name] = fn(y_hat, y)
            total = total + self.weights[name] * loss_dict[name]
        if with_dict:
            return total, loss_dict
        return total
