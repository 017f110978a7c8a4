"""Tests for the inventory-parity modules: chess, image facade, gui session."""

import numpy as np
import pytest

from chess2rt_tpu.chess import ArmyType, Board, Piece, PieceColor, PieceType
from chess2rt_tpu.chess.board import STARTING_POSITION
from chess2rt_tpu.exceptions import NotImplementedException, UnknownImageTypeException
from chess2rt_tpu.imageio import differentiate, load_exr, load_image, save_exr


class TestChess:
    def test_piece_bitfield_roundtrip(self):
        # every (type, color, army) combination packs/unpacks losslessly
        for t in PieceType:
            for c in PieceColor:
                for a in ArmyType:
                    p = Piece(t, c, a)
                    assert Piece.from_byte(p.to_byte()) == p

    def test_ascii_mapping(self):
        assert Piece.from_char("K").piece_type == PieceType.King
        assert Piece.from_char("K").color == PieceColor.White
        assert Piece.from_char("q").color == PieceColor.Black
        assert Piece.from_char(".").piece_type == PieceType.Empty
        assert Piece.from_char("n").to_char() == "n"
        with pytest.raises(ValueError):
            Piece.from_char("x")

    def test_board_roundtrip_and_algebraic(self):
        b = Board(STARTING_POSITION)
        assert str(b).replace("\n", "") == STARTING_POSITION
        # board.d test(): b["a1"] is the white rook corner
        assert b["a1"].piece_type == PieceType.Rook
        assert b["a1"].color == PieceColor.White
        assert b["b2"].piece_type == PieceType.Pawn
        assert b["d8"].piece_type == PieceType.Queen
        assert b["d8"].color == PieceColor.Black

    def test_string_formats_like_reference(self):
        assert str(Piece.from_char("K")) == "Classic White King"


class TestImageFacade:
    def test_exr_raises_not_implemented(self, tmp_path):
        # parity: bitmap.d:170-178 throws NotImplementedException
        with pytest.raises(NotImplementedException):
            load_exr("x.exr")
        with pytest.raises(NotImplementedException):
            save_exr(np.zeros((2, 2, 3)), "x.exr")

    def test_unknown_extension(self):
        with pytest.raises(UnknownImageTypeException):
            load_image("foo.png")

    def test_differentiate(self):
        img = np.zeros((4, 4, 3), dtype=np.float32)
        img[:, 2] = 1.0  # bright column
        d = differentiate(img)
        # bitmap.d:150: red = me - right, so the column left of the bright
        # one has derivative -1, the bright one +1
        assert d[0, 1, 0] == -1.0
        assert d[0, 2, 0] == 1.0
        assert (d[..., 2] == 0).all()

    def test_load_image_bmp(self, data_dir):
        img = load_image(str(data_dir / "floor.bmp"))
        assert img.shape == (256, 256, 3)


class TestInteractiveSession:
    @pytest.fixture()
    def session(self, data_dir, tmp_path):
        import jax.numpy as jnp

        from chess2rt_tpu.gui import InteractiveSession

        frames = []
        s = InteractiveSession(
            str(data_dir / "lecture4.sdl"), display=frames.append, dtype=jnp.float32
        )
        s.scene.settings.frameWidth = 32
        s.scene.settings.frameHeight = 24
        s.scene.camera.set_frame_size(32, 24)
        s.scene.settings.AAEnabled = False
        s._frames = frames
        return s

    def test_camera_keys_move_the_camera(self, session):
        pos0 = np.asarray(session.scene.camera.pos)
        session.handle_key("w")
        pos1 = np.asarray(session.scene.camera.pos)
        # W = forward 32 units along frontDir (raytracer_demo.d:299-303)
        assert np.linalg.norm(pos1 - pos0) == pytest.approx(32.0)
        assert len(session._frames) == 1

    def test_shift_arrow_rotates(self, session):
        yaw0 = session.scene.camera.yaw
        session.handle_key("left", "shift")
        assert session.scene.camera.yaw == yaw0 + 4.0

    def test_pitch_clamped(self, session):
        session.scene.camera.pitch = -89.0
        session.handle_key("s", "shift")  # pitch -4
        assert session.scene.camera.pitch == -90.0

    def test_mouse_look(self, session):
        yaw0, pitch0 = session.scene.camera.yaw, session.scene.camera.pitch
        session.handle_mouse(10, -5)
        assert session.scene.camera.yaw == pytest.approx(yaw0 - 2.0)
        assert session.scene.camera.pitch == pytest.approx(pitch0 + 1.0)

    def test_reload_and_screenshot(self, session, tmp_path):
        session.handle_key("r")
        path = session.screenshot(str(tmp_path / "shot.bmp"))
        assert np.asarray(session.frame).shape[-1] == 3
        from chess2rt_tpu.imageio import load_bmp_file

        assert load_bmp_file(path).width == session.scene.settings.frameWidth

    def test_click_inspection(self, session):
        out = session.handle_click(16, 20)
        # the dump now shows device + oracle side by side (round-2 item 5)
        assert "'floor'" in out
        assert "device (f32)" in out and "oracle (f64)" in out
        assert "(0, 1, 0)" in out  # plane normal

    def test_preview_matches_full_at_low_frequency(self, session):
        full = session.render(preview=False)
        prev = session.render(preview=True)
        assert prev.shape == full.shape
