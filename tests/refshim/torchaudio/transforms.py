import torch


class Spectrogram(torch.nn.Module):
    """torchaudio.transforms.Spectrogram subset used by DiscriminatorSpec
    (power=None -> complex STFT, center=True, reflect pad, hann window)."""

    def __init__(self, n_fft=400, win_length=None, hop_length=None, power=None,
                 normalized=False, center=True, pad_mode="reflect", pad=0, window_fn=torch.hann_window):
        super().__init__()
        self.n_fft = n_fft
        self.win_length = win_length or n_fft
        self.hop_length = hop_length or self.win_length // 2
        self.power = power
        self.center = center
        self.pad_mode = pad_mode
        self.register_buffer("window", window_fn(self.win_length))

    def forward(self, x):
        shape = x.shape
        spec = torch.stft(
            x.reshape(-1, shape[-1]),
            self.n_fft,
            hop_length=self.hop_length,
            win_length=self.win_length,
            window=self.window,
            center=self.center,
            pad_mode=self.pad_mode,
            normalized=False,
            onesided=True,
            return_complex=True,
        )
        spec = spec.reshape(shape[:-1] + spec.shape[-2:])
        if self.power is None:
            return spec
        return spec.abs() ** self.power
