"""Observability: root-gathered log flush (reference Logger::Flush,
Logger.cpp:83-129) with an injected gather emulating multiple processes."""

from elba_tpu.utils.logging import PhaseTimer, ProcessLogger


def test_flush_gathers_to_root():
    lg = ProcessLogger()
    lg("alpha")
    lg("beta")
    mine = "\n".join(["alpha", "beta"]).encode()

    # emulate 3 processes: this one is rank 0; ranks 1-2 injected
    def gather(payload):
        assert payload == mine
        return [payload, b"gamma", b""]

    out = []
    lg.flush("phase-x", log=out.append, gather=gather)
    assert out[0] == "==== phase-x ===="
    assert "[proc 0] alpha" in out
    assert "[proc 0] beta" in out
    assert "[proc 2]" not in " ".join(out)  # empty rank emits nothing
    assert "[proc 1] gamma" in out
    assert lg.buf == []  # buffer cleared


def test_flush_single_process_plain():
    lg = ProcessLogger()
    lg("solo")
    out = []
    lg.flush("solo-phase", log=out.append)
    assert out == ["==== solo-phase ====", "[proc 0] solo"]


def test_phase_timer_accumulates():
    t = PhaseTimer(sync=False)
    t.start("a")
    t.stop()
    t.start("a")
    t.stop()
    assert t.phases["a"] >= 0
    assert "a\t" in t.report()
