"""onnxruntime stub so reference vosk_tts modules can be imported as oracles
(the g2p/frontend logic under test never touches the runtime)."""


class SessionOptions:
    pass


class InferenceSession:
    def __init__(self, *a, **k):
        raise RuntimeError("onnxruntime stub: inference not available in tests")


def get_available_providers():
    return ["CPUExecutionProvider"]
