# Capture reference frames from the ACTUAL Godot plugin (ROADMAP #5).
#
# This environment has no Godot engine, so absolute pixel parity is tested
# against the literal shader transcription (tests/oracle/).  When an engine
# IS available, run this script inside a project that contains the
# reference plugin to capture the demo scene at the exact named camera
# poses our renderer uses (models/demo.py::demo_camera), then compare with
# tools/compare_captures.py.
#
#   godot --headless --path <project> --script res://tools/capture_reference.gd
#
# Notes for a faithful comparison (see compare_captures.py for the other
# half of each item):
#   * the demo env enables glow — either disable it in the captured scene
#     or render ours with --glow;
#   * set the viewport to 1024x1024 and disable FXAA/MSAA (we compare raw
#     shading, not post-AA);
#   * the plugin rebakes its optical-depth LUT over the first 2 frames —
#     this script waits 8 frames before each capture;
#   * TIME-animated detail noise and coverage rotation advance with engine
#     time — captures happen as early as possible and our side renders
#     with --time matched to the reported capture time.

extends SceneTree

const SCENE := "res://addons/zylann.atmosphere/demo/planet_atmosphere_test.tscn"
const SIZE := Vector2i(1024, 1024)
const SETTLE_FRAMES := 8

# name -> [eye, look_at]  (world units; matches models/demo.py::demo_camera)
const POSES := {
	"avatar": [Vector3(0, 0, 156.425), Vector3(0, 0, 0)],
	"exterior": [Vector3(180, 60, 180), Vector3(0, 0, 0)],
	"interior": [Vector3(0, 104, 0), Vector3(100, 100, 0)],
	"space": [Vector3(0, 150, 420), Vector3(0, 0, 0)],
	"sunrise": [Vector3(0, 103, 0), Vector3(0, 30, 598.677)],
	"sunward": [Vector3(0, 130, 300), Vector3(0, 0, 598.677)],
}


func _initialize() -> void:
	var packed: PackedScene = load(SCENE)
	if packed == null:
		push_error("cannot load " + SCENE + " — run inside the plugin project")
		quit(1)
		return
	var scene := packed.instantiate()
	root.add_child(scene)
	root.size = SIZE

	var cam := Camera3D.new()
	cam.fov = 70.0
	cam.near = 0.1
	cam.far = 800.0
	root.add_child(cam)
	cam.make_current()

	_capture_all(scene, cam)


func _capture_all(scene: Node, cam: Camera3D) -> void:
	await process_frame
	for pose_name: String in POSES:
		var eye: Vector3 = POSES[pose_name][0]
		var target: Vector3 = POSES[pose_name][1]
		cam.global_position = eye
		cam.look_at(target, Vector3.UP)
		for i in SETTLE_FRAMES:
			await process_frame
		var t := float(Time.get_ticks_msec()) / 1000.0
		var img := root.get_texture().get_image()
		var path := "user://capture_%s.png" % pose_name
		img.save_png(path)
		print("captured %s at t=%.3f -> %s" % [pose_name, t, path])
	quit(0)
