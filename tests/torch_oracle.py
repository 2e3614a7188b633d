"""Independent torch-CPU oracle of the DeepSEA-Beluga architecture for
equivalence testing (architecture per reference Beluga.py:18-51; this is a
clean declaration of the published topology, not a code copy)."""

import torch
from torch import nn


class TorchBeluga(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv = nn.Sequential(
            nn.Conv2d(4, 320, (1, 8)), nn.ReLU(),
            nn.Conv2d(320, 320, (1, 8)), nn.ReLU(),
            nn.MaxPool2d((1, 4), (1, 4)),
            nn.Conv2d(320, 480, (1, 8)), nn.ReLU(),
            nn.Conv2d(480, 480, (1, 8)), nn.ReLU(),
            nn.MaxPool2d((1, 4), (1, 4)),
            nn.Conv2d(480, 640, (1, 8)), nn.ReLU(),
            nn.Conv2d(640, 640, (1, 8)), nn.ReLU(),
        )
        self.fc1 = nn.Linear(67840, 2003)
        self.fc2 = nn.Linear(2003, 2002)

    def forward(self, x):  # x: (N, 4, 1, 2000)
        h = self.conv(x)
        h = h.view(h.size(0), -1)  # channel-major flatten, as torch does
        h = torch.relu(self.fc1(h))
        return torch.sigmoid(self.fc2(h))

    def state_dict_reference_keys(self):
        """Rename to the reference checkpoint's nested-Sequential keys
        (model.0.N / model.1.N.1) so the converter sees the real layout."""
        mapping = {
            "conv.0": "model.0.0", "conv.2": "model.0.2", "conv.5": "model.0.6",
            "conv.7": "model.0.8", "conv.10": "model.0.12", "conv.12": "model.0.14",
            "fc1": "model.1.2.1", "fc2": "model.1.4.1",
        }
        out = {}
        for k, v in self.state_dict().items():
            stem, leaf = k.rsplit(".", 1)
            out[mapping[stem] + "." + leaf] = v
        return out
