"""Runtime protobuf message classes for the TTS service.

grpc_tools isn't available in this image, but plain ``protoc`` and the
protobuf runtime are: the .proto is compiled to a FileDescriptorSet (cached
next to the source) and message classes are materialized with
``message_factory`` — no generated _pb2.py files needed.
"""

from __future__ import annotations

import os
import subprocess

from google.protobuf import descriptor_pb2, descriptor_pool, message_factory

_HERE = os.path.dirname(os.path.abspath(__file__))
PROTO = os.path.join(_HERE, "tts_service.proto")
DESC = os.path.join(_HERE, "tts_service.desc")

SERVICE_NAME = "vosk.tts.Synthesizer"
METHOD = "UtteranceSynthesis"


def _ensure_descriptor() -> bytes:
    if not os.path.exists(DESC) or os.path.getmtime(DESC) < os.path.getmtime(PROTO):
        subprocess.run(
            ["protoc", f"--proto_path={_HERE}", f"--descriptor_set_out={DESC}", PROTO],
            check=True,
        )
    with open(DESC, "rb") as f:
        return f.read()


_pool = descriptor_pool.DescriptorPool()
_fds = descriptor_pb2.FileDescriptorSet.FromString(_ensure_descriptor())
for _file in _fds.file:
    _pool.Add(_file)


def _msg(name: str):
    return message_factory.GetMessageClass(_pool.FindMessageTypeByName(f"vosk.tts.{name}"))


UtteranceSynthesisRequest = _msg("UtteranceSynthesisRequest")
UtteranceSynthesisResponse = _msg("UtteranceSynthesisResponse")
AudioChunk = _msg("AudioChunk")
Hints = _msg("Hints")
AudioFormatOptions = _msg("AudioFormatOptions")
RawAudio = _msg("RawAudio")
ContainerAudio = _msg("ContainerAudio")
