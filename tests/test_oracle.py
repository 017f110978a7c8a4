"""Unit tests for the NumPy oracle renderer against hand-computed values.

The oracle is the framework's golden-image generator (SURVEY.md §4), so its
primitive math is verified here against closed-form expectations derived from
the reference formulas (file:line cites at each site)."""

import numpy as np
import pytest

from chess2rt_tpu.models import types as T
from chess2rt_tpu.oracle import renderer as orc


def _rays(*rows):
    orig = np.array([r[0] for r in rows], dtype=np.float64)
    dir = np.array([r[1] for r in rows], dtype=np.float64)
    return orig, dir


class TestPlane:
    def test_basic_hit(self):
        # ray from (0,2,0) straight down at plane y=0 (geometry.d:30-59)
        orig, dir = _rays(([0, 2, 0], [0, -1, 0]))
        rec = orc.HitRecord(1)
        ok = orc.intersect_plane(T.Plane(y=0.0), orig, dir, rec)
        assert ok.all()
        assert rec.dist[0] == pytest.approx(2.0)
        np.testing.assert_allclose(rec.normal[0], [0, 1, 0])
        assert rec.u[0] == pytest.approx(0.0) and rec.v[0] == pytest.approx(0.0)

    def test_horizon_and_backside(self):
        plane = T.Plane(y=0.0)
        orig, dir = _rays(
            ([0, 2, 0], [1, 0, 0]),      # parallel, above -> miss
            ([0, 2, 0], [0, 1, 0]),      # pointing up, plane below -> miss
            ([0, -2, 0], [0, -1, 0]),    # below, pointing down -> miss
            ([0, -2, 0], [0, 1, 0]),     # below, pointing up -> hit from below
        )
        rec = orc.HitRecord(4)
        ok = orc.intersect_plane(plane, orig, dir, rec)
        assert list(ok) == [False, False, False, True]
        assert rec.dist[3] == pytest.approx(2.0)

    def test_limit(self):
        plane = T.Plane(y=0.0, limit=1.0)
        orig, dir = _rays(([5, 1, 0], [0, -1, 0]), ([0.5, 1, 0], [0, -1, 0]))
        rec = orc.HitRecord(2)
        ok = orc.intersect_plane(plane, orig, dir, rec)
        assert list(ok) == [False, True]

    def test_only_improves_dist(self):
        orig, dir = _rays(([0, 2, 0], [0, -1, 0]))
        rec = orc.HitRecord(1)
        rec.dist[:] = 1.0  # closer hit already found
        assert not orc.intersect_plane(T.Plane(y=0.0), orig, dir, rec).any()
        assert rec.dist[0] == 1.0


class TestSphere:
    def test_two_roots_and_inside(self):
        s = T.Sphere(center=(0, 0, 5), R=1.0)
        orig, dir = _rays(
            ([0, 0, 0], [0, 0, 1]),   # outside: hits at z=4 (nearer root)
            ([0, 0, 5], [0, 0, 1]),   # inside: x2=-1 behind, picks x1=+1
            ([0, 0, 10], [0, 0, 1]),  # behind us entirely -> miss
        )
        rec = orc.HitRecord(3)
        ok = orc.intersect_sphere(s, orig, dir, rec)
        assert list(ok) == [True, True, False]
        assert rec.dist[0] == pytest.approx(4.0)
        assert rec.dist[1] == pytest.approx(1.0)
        np.testing.assert_allclose(rec.normal[0], [0, 0, -1], atol=1e-12)

    def test_uv_mapping(self):
        # hit point at +X pole: angle = atan2(0, 1) = 0 -> u = (pi+0)/2pi = 0.5
        # y at equator -> v = 1 - (pi/2 + 0)/pi = 0.5   (geometry.d:118-120)
        s = T.Sphere(center=(0, 0, 0), R=1.0)
        orig, dir = _rays(([5, 0, 0], [-1, 0, 0]))
        rec = orc.HitRecord(1)
        assert orc.intersect_sphere(s, orig, dir, rec).all()
        assert rec.u[0] == pytest.approx(0.5)
        assert rec.v[0] == pytest.approx(0.5)

    def test_is_inside(self):
        s = T.Sphere(center=(0, 0, 0), R=2.0)
        p = np.array([[0, 0, 0], [1.9, 0, 0], [2.1, 0, 0], [2.0, 0, 0]])
        # strict < (geometry.d:127-130): boundary point is NOT inside
        assert list(orc.is_inside(s, p)) == [True, True, False, False]


class TestCube:
    def test_face_hits(self):
        c = T.Cube(center=(0, 0, 0), side=2.0)
        orig, dir = _rays(
            ([0, 5, 0], [0, -1, 0]),   # top face y=+1
            ([5, 0, 0], [-1, 0, 0]),   # +x face
            ([0, 0, -5], [0, 0, 1]),   # -z face
        )
        rec = orc.HitRecord(3)
        ok = orc.intersect_cube(c, orig, dir, rec)
        assert ok.all()
        np.testing.assert_allclose(rec.dist, [4, 4, 4])
        np.testing.assert_allclose(rec.normal[0], [0, 1, 0], atol=1e-12)
        np.testing.assert_allclose(rec.normal[1], [1, 0, 0], atol=1e-12)
        np.testing.assert_allclose(rec.normal[2], [0, 0, -1], atol=1e-12)

    def test_uv_is_local_offset(self):
        # hit on top face at (0.25, 1, -0.5): u = p.x - c.x, v = p.z - c.z
        # (geometry.d:229-230)
        c = T.Cube(center=(0, 0, 0), side=2.0)
        orig, dir = _rays(([0.25, 5, -0.5], [0, -1, 0]))
        rec = orc.HitRecord(1)
        assert orc.intersect_cube(c, orig, dir, rec).all()
        assert rec.u[0] == pytest.approx(0.25)
        assert rec.v[0] == pytest.approx(-0.5)

    def test_is_inside_max_norm(self):
        c = T.Cube(center=(0, 0, 0), side=2.0)
        p = np.array([[0, 0, 0], [1.0, 1.0, 1.0], [1.01, 0, 0]])
        # <= comparison (geometry.d:165-170): the boundary IS inside
        assert list(orc.is_inside(c, p)) == [True, True, False]


class TestCsg:
    def _diff(self):
        cube = T.Cube(name="c", center=(0, 0, 0), side=2.0)
        sphere = T.Sphere(name="s", center=(1, 0, 0), R=1.0)
        return T.CsgDiff(left=cube, right=sphere, op="diff")

    def test_find_all_intersections_sphere(self):
        s = T.Sphere(center=(0, 0, 5), R=1.0)
        orig, dir = _rays(([0, 0, 0], [0, 0, 1]))
        hits = orc.find_all_intersections(s, orig, dir, 2)
        assert hits.count[0] == 2
        # entry 4.0 exact; exit recorded as ~6.0 minus the epsilon recast drift
        assert hits.dist[0, 0] == pytest.approx(4.0)
        assert hits.dist[0, 1] == pytest.approx(6.0, abs=1e-5)

    def test_diff_carves_surface(self):
        # Ray along +x axis into cube face x=-1; the sphere at (1,0,0) eats
        # the far half, so the CSG entry is the cube face, exit via sphere.
        g = self._diff()
        orig, dir = _rays(([-5, 0, 0], [1, 0, 0]))
        rec = orc.HitRecord(1)
        ok = orc.intersect_csg(g, orig, dir, rec)
        assert ok.all()
        assert rec.dist[0] == pytest.approx(4.0)  # front face of cube
        np.testing.assert_allclose(rec.normal[0], [-1, 0, 0], atol=1e-9)

    def test_diff_inside_carved_region_normal_flip(self):
        # Ray starts inside the carved-out hollow (inside sphere, inside cube)
        # going -x: first CSG-true point is where we exit the sphere into
        # cube-minus-sphere material; the hit is on the sphere surface (an
        # "eaten-out" wall) so the normal is flipped towards the ray origin
        # (geometry.d:377-397).
        g = self._diff()
        orig, dir = _rays(([0.5, 0, 0], [-1, 0, 0]))
        rec = orc.HitRecord(1)
        ok = orc.intersect_csg(g, orig, dir, rec)
        assert ok.all()
        assert rec.dist[0] == pytest.approx(0.5)  # sphere wall at x=0
        # un-flipped sphere normal at (0,0,0) is (-1,0,0); flip -> (+1,0,0)
        np.testing.assert_allclose(rec.normal[0], [1, 0, 0], atol=1e-6)

    def test_union_counts_and_inter(self):
        a = T.Sphere(center=(0, 0, 4), R=1.0)
        b = T.Sphere(center=(0, 0, 5), R=1.0)
        u = T.CsgUnion(left=a, right=b, op="union")
        i = T.CsgInter(left=a, right=b, op="inter")
        orig, dir = _rays(([0, 0, 0], [0, 0, 1]))
        rec = orc.HitRecord(1)
        assert orc.intersect_csg(u, orig, dir, rec).all()
        assert rec.dist[0] == pytest.approx(3.0)  # first sphere entry
        rec2 = orc.HitRecord(1)
        assert orc.intersect_csg(i, orig, dir, rec2).all()
        assert rec2.dist[0] == pytest.approx(4.0)  # lens entry = b's near face

    def test_miss(self):
        g = self._diff()
        orig, dir = _rays(([-5, 5, 0], [1, 0, 0]))
        rec = orc.HitRecord(1)
        assert not orc.intersect_csg(g, orig, dir, rec).any()


class TestNodeTransform:
    def test_scaled_sphere_distance(self):
        # Sphere R=1 scaled x10 => effective R=10.  Ray from (0,0,-30) must
        # hit at world distance 20 (node.d:23-68 rescaling algebra).
        n = T.Node(geometry=T.Sphere(center=(0, 0, 0), R=1.0), shader=T.Lambert())
        n.transform.scale(10, 10, 10)
        orig, dir = _rays(([0, 0, -30], [0, 0, 1]))
        rec = orc.HitRecord(1)
        ok = orc.intersect_node(n, orig, dir, rec)
        assert ok.all()
        assert rec.dist[0] == pytest.approx(20.0)
        np.testing.assert_allclose(rec.normal[0], [0, 0, -1], atol=1e-12)
        np.testing.assert_allclose(rec.p[0], [0, 0, -10], atol=1e-9)

    def test_translate(self):
        n = T.Node(geometry=T.Sphere(center=(0, 0, 0), R=1.0), shader=T.Lambert())
        n.transform.translate((5, 0, 0))
        orig, dir = _rays(([5, 0, -10], [0, 0, 1]))
        rec = orc.HitRecord(1)
        assert orc.intersect_node(n, orig, dir, rec).all()
        assert rec.dist[0] == pytest.approx(9.0)

    def test_nonuniform_scale_normal_uses_transposed_inverse(self):
        # Ellipsoid (2,1,1): at the point (0, 1, 0) the geometric normal is
        # still (0,1,0); hit from above.
        n = T.Node(geometry=T.Sphere(center=(0, 0, 0), R=1.0), shader=T.Lambert())
        n.transform.scale(2, 1, 1)
        orig, dir = _rays(([0, 5, 0], [0, -1, 0]))
        rec = orc.HitRecord(1)
        assert orc.intersect_node(n, orig, dir, rec).all()
        assert rec.dist[0] == pytest.approx(4.0)
        np.testing.assert_allclose(rec.normal[0], [0, 1, 0], atol=1e-12)


class TestTextures:
    def test_checker_negative_quadrants(self):
        # floor(u/size)+floor(v/size) parity incl. negatives (texture.d:48-53):
        # u=150,v=-230,size=100 -> cells (1,-3), sum -2 -> even -> color1
        t = T.Checker(color1=(1, 0, 0), color2=(0, 1, 0), size=100.0)
        c = orc.tex_color(t, np.array([150.0, 150.0]), np.array([-230.0, -130.0]))
        np.testing.assert_allclose(c[0], [1, 0, 0])  # sum even -> color1
        np.testing.assert_allclose(c[1], [0, 1, 0])  # sum odd (1 + -2) -> color2

    def test_procedure2(self):
        t = T.Procedure2(
            colorU=((1, 0, 0), (0, 1, 0), (0, 0, 1)),
            colorV=((0, 0, 0), (0, 0, 0), (0, 0, 0)),
            freqU=(1.0, 2.0, 3.0),
            freqV=(1.0, 1.0, 1.0),
        )
        u = np.array([0.7])
        c = orc.tex_color(t, u, np.array([0.0]))
        exp = np.array([np.sin(0.7), np.sin(1.4), np.sin(2.1)], dtype=np.float32)
        np.testing.assert_allclose(c[0], exp, rtol=1e-6)

    def test_bitmap_bilinear_wrap(self):
        img = np.zeros((2, 2, 3), dtype=np.float32)
        img[0, 0] = [1, 0, 0]
        img[0, 1] = [0, 1, 0]
        img[1, 0] = [0, 0, 1]
        img[1, 1] = [1, 1, 1]
        t = T.BitmapTexture(scaling=1.0, data=img)
        # u=v=0 -> texel (0,0) exactly
        c = orc.tex_color(t, np.array([0.0]), np.array([0.0]))
        np.testing.assert_allclose(c[0], [1, 0, 0], atol=1e-6)
        # u=0.25,v=0 -> halfway between (0,0) and (0,1) in x
        c = orc.tex_color(t, np.array([0.25]), np.array([0.0]))
        np.testing.assert_allclose(c[0], [0.5, 0.5, 0], atol=1e-6)
        # wrap: u=0.75 -> between texel 1 and texel 0 (far edge wraps)
        c = orc.tex_color(t, np.array([0.75]), np.array([0.0]))
        np.testing.assert_allclose(c[0], [0.5, 0.5, 0], atol=1e-6)


class TestShading:
    def _one_pixel_scene(self):
        sc = T.Scene()
        sc.settings = T.GlobalSettings()
        sc.settings.ambientLightColor = (0.0, 0.0, 0.0)
        sc.lights = [T.PointLight(pos=(0, 10, 0), color=(1, 1, 1), power=100.0)]
        sh = T.Lambert(color=(1.0, 0.5, 0.25))
        n = T.Node(geometry=T.Plane(y=0.0), shader=sh)
        sc.nodes = [n]
        sc.camera = T.Camera(pos=(0, 1, 0))
        return sc

    def test_lambert_closed_form(self):
        # Light directly overhead of the hit point (0,0,0): cosTheta=1,
        # dist^2 = 100 => contribution = power*color/100 (shader.d:67-105).
        sc = self._one_pixel_scene()
        r = orc.OracleRenderer(sc)
        orig = np.array([[0.0, 1.0, 0.0]])
        dir = np.array([[0.0, -1.0, 0.0]])
        c = r.raytrace(orig, dir)
        np.testing.assert_allclose(c[0], np.array([1.0, 0.5, 0.25]) * (100.0 / 100.0), rtol=1e-6)

    def test_shadowed_point_is_ambient_only(self):
        sc = self._one_pixel_scene()
        # occluder sphere between hit point and light
        sc.nodes.append(T.Node(geometry=T.Sphere(center=(0, 5, 0), R=1.0), shader=T.Lambert()))
        r = orc.OracleRenderer(sc)
        c = r.raytrace(np.array([[0.0, 1.0, 0.0]]), np.array([[0.0, -1.0, 0.0]]))
        np.testing.assert_allclose(c[0], [0, 0, 0], atol=1e-12)

    def test_phong_specular_untinted(self):
        # Head-on geometry: light, viewer and normal colinear => R = lightDir
        # reflected = back towards the light; cosGamma = dot(R, -ray.dir) = 1
        # so specular = baseLight * strength, NOT multiplied by the (red)
        # diffuse color (shader.d:197-250).
        sc = self._one_pixel_scene()
        sc.nodes[0].shader = T.Phong(color=(1.0, 0.0, 0.0), exponent=10.0, strength=0.5)
        sc.lights[0] = T.PointLight(pos=(0, 10, 0), color=(1, 1, 1), power=100.0)
        r = orc.OracleRenderer(sc)
        c = r.raytrace(np.array([[0.0, 10.0, 0.0]]), np.array([[0.0, -1.0, 0.0]]))
        # hit at (0,0,0); |p-light|^2 = 100; base = 1; lambert = base*1
        # diffuse*(lambert) = (1,0,0); specular = base*1^10*0.5 = 0.5 on all ch.
        np.testing.assert_allclose(c[0], [1.5, 0.5, 0.5], rtol=1e-6)

    def test_depth_cutoff(self):
        sc = self._one_pixel_scene()
        r = orc.OracleRenderer(sc)
        c = r.raytrace(np.array([[0.0, 1.0, 0.0]]), np.array([[0.0, -1.0, 0.0]]),
                       depth=sc.settings.maxTraceDepth + 1)
        np.testing.assert_allclose(c[0], [0, 0, 0])

    def test_reflection_extension(self):
        # Mirror plane under a sky-less scene: reflected ray must re-trace.
        sc = self._one_pixel_scene()
        mirror = T.Node(geometry=T.Plane(y=0.0), shader=T.Reflection(color=(0.9, 0.9, 0.9)))
        lit = T.Node(geometry=T.Sphere(center=(0, 5, 0), R=1.0), shader=T.Lambert(color=(0, 1, 0)))
        sc.nodes = [mirror, lit]
        # light below the sphere so its mirror-visible underside is lit
        sc.lights = [T.PointLight(pos=(0.2, 2.0, 0.0), color=(1, 1, 1), power=10.0)]
        r = orc.OracleRenderer(sc)
        # ray down at origin reflects straight up into the sphere
        c = r.raytrace(np.array([[0.2, 1.0, 0.0]]), np.array([[0.0, -1.0, 0.0]]))
        assert c[0, 1] > 0  # green sphere seen in the mirror
        assert c[0, 0] == pytest.approx(0.0, abs=1e-9)


class TestCameraRays:
    def test_center_ray_points_front(self):
        cam = T.Camera(pos=(0, 0, 0), fov=90.0)
        cam.set_frame_size(640, 480)
        fr = orc.begin_frame(cam)
        o, d = orc.get_screen_rays(cam, fr, np.array([320.0]), np.array([240.0]))
        np.testing.assert_allclose(d[0], [0, 0, 1], atol=1e-12)

    def test_fov_corner(self):
        # upLeft direction length in xy-plane equals tan(fov/2) (camera.d:84-100)
        cam = T.Camera(pos=(0, 0, 0), fov=90.0)
        cam.set_frame_size(640, 480)
        fr = orc.begin_frame(cam)
        xy = np.linalg.norm(fr["up_left"][:2])
        assert xy == pytest.approx(np.tan(np.radians(45.0)))

    def test_pitch_rotation(self):
        cam = T.Camera(pos=(0, 165, 0), pitch=-30.0, fov=90.0)
        cam.set_frame_size(640, 480)
        fr = orc.begin_frame(cam)
        # front dir rotated -30deg about X: (0, sin(-(-30))... ) check downward tilt
        np.testing.assert_allclose(
            fr["front_dir"], [0, -np.sin(np.radians(30)), np.cos(np.radians(30))], atol=1e-12
        )


class TestFullFrame:
    def test_lecture4_stats(self, data_dir):
        from chess2rt_tpu.scene.loader import parse_scene_from_file

        sc = parse_scene_from_file(str(data_dir / "lecture4.sdl"))
        sc.settings.frameWidth, sc.settings.frameHeight = 64, 48
        sc.camera.set_frame_size(64, 48)
        img = orc.OracleRenderer(sc).render()
        assert img.shape == (48, 64, 3)
        assert np.isfinite(img).all()
        # checker color2 is (0, .5, 1): red channel identically zero
        assert img[..., 0].max() == 0.0
        assert img.max() > 0.5  # lit floor visible
        # sky (upper rows) is black
        assert img[0].max() == 0.0
