import torch


class MulticlassAccuracy(torch.nn.Module):
    def __init__(self, num_classes, top_k=1, average="micro", multidim_average="global", ignore_index=None):
        super().__init__()
        self.top_k = top_k
        self.ignore_index = ignore_index

    def forward(self, logits, targets):
        # logits: (B, C, T), targets: (B, T)
        topk = logits.topk(self.top_k, dim=1).indices  # (B, k, T)
        hit = (topk == targets.unsqueeze(1)).any(dim=1)
        if self.ignore_index is not None:
            mask = targets != self.ignore_index
            return (hit & mask).sum().float() / mask.sum().clamp(min=1)
        return hit.float().mean()
