"""Progress logging + best-AP tracking (parity: misc/logger.py)."""

from __future__ import annotations

from tqdm import tqdm


class Logger:
    def __init__(self):
        self.best_ap = -1.0
        self.bar = None

    def clear(self, total: int):
        if self.bar is not None:
            self.bar.close()
        self.bar = tqdm(total=total)

    def display(self, loss, loss2, update_size: int, epoch: int):
        if self.bar is None:
            return
        post = {"EP": epoch, "Loss": float(loss)}
        if loss2 is not None:
            post["Loss2"] = float(loss2)
        self.bar.set_postfix(**post)
        self.bar.update(update_size)

    def show_best_ap(self) -> float:
        return self.best_ap

    def update_best_acc(self, acc: float):
        self.best_ap = acc

    def is_best_acc_ap(self, acc: float) -> bool:
        if acc > self.best_ap or self.best_ap == -1.0:
            self.best_ap = acc
            return True
        return False
