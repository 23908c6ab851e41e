//! Records numeric fixtures from the actual Rust reference for
//! tests/test_reference_constants.py::test_against_recorded_rust_fixtures.
//!
//! Drives the reference's public API through the same two scenarios its
//! own tests encode (lib.rs:422-453 step integration;
//! tests/event_listeners_test.rs:64-111 source/sink population curve) and
//! prints one JSON document on stdout.  The TTC values are emitted as the
//! constants the reference's unit tests assert_eq! on (zanlungo.rs:225-236);
//! `Zanlungo::time_to_collision` is private, so validate them by running
//! `cargo test -p rmf_crowdsim` alongside this recorder (MIGRATION.md).

use rmf_crowdsim::local_planners::no_local_plan::NoLocalPlan;
use rmf_crowdsim::source_sink::source_sink::{MonotonicCrowd, SourceSink};
use rmf_crowdsim::spatial_index::location_hash_2d::LocationHash2D;
use rmf_crowdsim::*;
use std::sync::{Arc, Mutex};

struct StubHighLevelPlan {
    default_vel: Vec2f,
}

impl HighLevelPlanner for StubHighLevelPlan {
    fn get_desired_velocity(
        &mut self,
        _agent: &Agent,
        _time: std::time::Duration,
    ) -> Option<Vec2f> {
        Some(self.default_vel)
    }
    fn set_target(&mut self, _agent: &Agent, _point: Point, _tolerance: Vec2f) {}
    fn remove_agent_id(&mut self, _agent: AgentId) {}
}

fn new_sim() -> Simulation<LocationHash2D> {
    let stub_spatial =
        LocationHash2D::new(1000f64, 1000f64, 20f64, Point::new(-500f64, -500f64));
    Simulation::new(stub_spatial)
}

fn main() {
    // Scenario 1: lib.rs:422-453 step integration.
    let mut sim = new_sim();
    let hl = Arc::new(Mutex::new(StubHighLevelPlan {
        default_vel: Vec2f::new(1.0f64, 0.0f64),
    }));
    let lp = Arc::new(Mutex::new(NoLocalPlan {}));
    sim.add_agents(&vec![Point::new(0f64, 0f64)], hl.clone(), lp.clone(), 100f64)
        .unwrap();
    sim.step(std::time::Duration::new(1, 0)).unwrap();
    let pos = sim.agents[&0usize].position;

    // Scenario 2: event_listeners_test.rs:64-111 population curve
    // (pre-step population for 40 one-second steps).
    let mut sim2 = new_sim();
    let crowd_generator = Arc::new(MonotonicCrowd::new(1f64));
    let source_sink = Arc::new(SourceSink {
        source: Vec2f::new(0f64, 0f64),
        waypoints: vec![Vec2f::new(20f64, 0f64)],
        radius_sink: 1f64,
        crowd_generator,
        high_level_planner: hl,
        local_planner: lp,
        agent_eyesight_range: 5f64,
        loop_forever: false,
    });
    sim2.add_source_sink(source_sink);
    let mut curve: Vec<usize> = vec![];
    for _ in 0..40 {
        curve.push(sim2.agents.len());
        sim2.step(std::time::Duration::new(1, 0)).unwrap();
    }

    println!("{{");
    println!(
        "  \"step_integration\": {{\"position\": [{:.17}, {:.17}]}},",
        pos.x, pos.y
    );
    println!("  \"ttc\": {{\"head_on\": 6.0, \"never_collide\": \"inf\"}},");
    println!(
        "  \"event_listener\": {{\"population_before_step\": {:?}}}",
        curve
    );
    println!("}}");
}
